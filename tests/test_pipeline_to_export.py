"""End-to-end: curation pipeline output -> trainer-facing JSONL shards
-> manifest verify -> reload. The full path a user of this engine runs
to produce a training corpus, exercised as one flow rather than as
isolated units."""

from __future__ import annotations

import glob
import gzip
import json
import os

from dod_etl_spark.operators.export import verify_manifest, write_jsonl_shards
from dod_etl_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def test_curation_to_jsonl_roundtrip(spark, tmp_path):
    curated = QUERIES["curation_pipeline_docs"](spark, SF_SMOKE)
    n_curated = curated.count()
    assert n_curated > 0

    dest = str(tmp_path / "train_export")
    manifest = write_jsonl_shards(curated, dest, n_shards=4, shard_key="doc_id")
    assert manifest["total_rows"] == n_curated
    assert verify_manifest(spark, dest)["ok"]

    # Reload through gzip+json (what a trainer's loader does) and check
    # the corpus survived byte-exact: same ids, same column set.
    rows = []
    for path in glob.glob(os.path.join(dest, "shard=*", "*.txt.gz")):
        with gzip.open(path, "rt") as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == n_curated
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in curated.select("doc_id").collect()
    }
    assert set(rows[0]) == set(curated.columns)

    # Deterministic export: a second export of the same frame produces
    # byte-identical shard checksums (resumable/reproducible transfer).
    dest2 = str(tmp_path / "train_export2")
    manifest2 = write_jsonl_shards(curated, dest2, n_shards=4, shard_key="doc_id")
    assert [s["checksum"] for s in manifest["shards"]] == [
        s["checksum"] for s in manifest2["shards"]
    ]
