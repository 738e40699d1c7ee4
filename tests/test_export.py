"""Sharded export + manifest contract (operators/export.py)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from dod_etl_spark.operators.export import (
    MANIFEST_NAME,
    shard_column,
    verify_manifest,
    write_shards,
)


@pytest.fixture()
def docs(spark):
    return (
        spark.range(500)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
        )
    )


def test_write_shards_roundtrip(spark, docs, tmp_path):
    dest = str(tmp_path / "export")
    manifest = write_shards(docs, dest, n_shards=4, shard_key="doc_id")
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] == 500
    assert sum(s["rows"] for s in manifest["shards"]) == 500
    assert all(s["bytes"] > 0 for s in manifest["shards"])
    assert os.path.exists(os.path.join(dest, MANIFEST_NAME))
    back = spark.read.parquet(dest)
    assert back.count() == 500
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(500))
    # Hive layout: one file per shard directory.
    dirs = sorted(d for d in os.listdir(dest) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(dest, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)


def test_shard_assignment_deterministic(spark, docs, tmp_path):
    """Same corpus, different partitioning -> identical doc->shard map."""
    a = docs.withColumn("s", shard_column(F.col("doc_id"), 8))
    b = docs.repartition(13).withColumn("s", shard_column(F.col("doc_id"), 8))
    ma = {r["doc_id"]: r["s"] for r in a.collect()}
    mb = {r["doc_id"]: r["s"] for r in b.collect()}
    assert ma == mb
    assert set(ma.values()) == set(range(8))


def test_verify_manifest_detects_tamper(spark, docs, tmp_path):
    dest = str(tmp_path / "export")
    write_shards(docs, dest, n_shards=3, shard_key="doc_id")
    assert verify_manifest(spark, dest)["ok"]

    # Corrupt: drop one shard's rows by rewriting it with a subset.
    shard_dir = next(d for d in sorted(os.listdir(dest)) if d.startswith("shard="))
    shard = next(
        n for n in sorted(os.listdir(os.path.join(dest, shard_dir)))
        if n.endswith(".parquet")
    )
    victim = os.path.join(dest, shard_dir, shard)
    one = spark.read.parquet(victim).limit(5)
    one_pdf = one.toPandas()
    os.remove(victim)
    # Drop Hadoop's local-FS CRC sidecar so the tamper reaches OUR
    # manifest check instead of failing in the filesystem layer.
    crc = os.path.join(dest, shard_dir, f".{shard}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(one_pdf), victim)
    result = verify_manifest(spark, dest)
    assert not result["ok"]
    assert any(shard in e for e in result["errors"])


def test_verify_manifest_detects_missing_shard(spark, docs, tmp_path):
    dest = str(tmp_path / "export")
    write_shards(docs, dest, n_shards=3, shard_key="doc_id")
    shard_dir = next(d for d in sorted(os.listdir(dest)) if d.startswith("shard="))
    inner = os.path.join(dest, shard_dir)
    shard = next(n for n in sorted(os.listdir(inner)) if n.endswith(".parquet"))
    os.remove(os.path.join(inner, shard))
    result = verify_manifest(spark, dest)
    assert not result["ok"]
    assert any("missing" in e or shard in e for e in result["errors"])


def test_manifest_json_stable_shape(spark, docs, tmp_path):
    dest = str(tmp_path / "export")
    write_shards(docs, dest, n_shards=2, shard_key="doc_id")
    with open(os.path.join(dest, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert set(m) == {
        "format",
        "n_shards",
        "shard_key",
        "schema",
        "total_rows",
        "shards",
    }
    assert all(set(s) == {"file", "rows", "bytes", "checksum"} for s in m["shards"])


def test_write_jsonl_shards_roundtrip_gzip(spark, docs, tmp_path):
    from dod_etl_spark.operators.export import write_jsonl_shards

    dest = str(tmp_path / "jsonl")
    manifest = write_jsonl_shards(docs, dest, n_shards=4, shard_key="doc_id")
    assert manifest["format"] == "jsonl"
    assert manifest["compression"] == "gzip"
    assert manifest["n_shards"] == 4
    assert manifest["total_rows"] == 500
    assert all(s["bytes"] > 0 for s in manifest["shards"])
    assert verify_manifest(spark, dest)["ok"]
    # every line is valid JSON carrying the original row
    import glob
    import gzip

    rows = []
    for path in glob.glob(os.path.join(dest, "shard=*", "*.txt.gz")):
        with gzip.open(path, "rt") as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["doc_id"] for r in rows) == list(range(500))
    assert all(r["text"] == f"text-{r['doc_id']}" for r in rows)


def test_jsonl_manifest_detects_tamper(spark, docs, tmp_path):
    """One flipped byte in one line of one shard must fail verification
    (raw .txt so the tamper reaches our checksum, not the gzip CRC)."""
    from dod_etl_spark.operators.export import write_jsonl_shards

    dest = str(tmp_path / "jsonl")
    write_jsonl_shards(docs, dest, n_shards=3, shard_key="doc_id", compression=None)
    assert verify_manifest(spark, dest)["ok"]

    shard_dir = next(d for d in sorted(os.listdir(dest)) if d.startswith("shard="))
    inner = os.path.join(dest, shard_dir)
    victim_name = next(n for n in sorted(os.listdir(inner)) if n.endswith(".txt"))
    victim = os.path.join(inner, victim_name)
    with open(victim) as f:
        lines = f.readlines()
    lines[0] = lines[0].replace("text-", "texT-", 1)
    crc = os.path.join(inner, f".{victim_name}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with open(victim, "w") as f:
        f.writelines(lines)
    result = verify_manifest(spark, dest)
    assert not result["ok"]
    assert any(victim_name in e for e in result["errors"])


def test_jsonl_and_parquet_shard_identically(spark, docs, tmp_path):
    """The doc->shard map is format-independent (same content hash), so
    a trainer can switch formats without re-balancing readers."""
    from dod_etl_spark.operators.export import write_jsonl_shards

    pq_dest = str(tmp_path / "pq")
    jl_dest = str(tmp_path / "jl")
    write_shards(docs, pq_dest, n_shards=4, shard_key="doc_id")
    write_jsonl_shards(docs, jl_dest, n_shards=4, shard_key="doc_id")
    pq_rows = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(pq_dest).select("doc_id", "shard").collect()
    }
    jl = spark.read.text(jl_dest)
    jl_rows = {
        (json.loads(r["value"])["doc_id"], r["shard"]) for r in jl.collect()
    }
    assert pq_rows == jl_rows


def test_epoch_shuffle_deterministic_and_distinct(spark, docs, tmp_path):
    """Within-shard training-order shuffle: same epoch -> identical
    line order; different epoch -> different order, same content, and
    the SAME manifest checksums (order-insensitive by design) — so an
    epoch re-export never invalidates a verified transfer."""
    import glob

    from dod_etl_spark.operators.export import write_jsonl_shards

    def export(dest, epoch):
        m = write_jsonl_shards(
            docs, dest, n_shards=3, shard_key="doc_id",
            compression=None, epoch=epoch,
        )
        order = {}
        for p in sorted(glob.glob(os.path.join(dest, "shard=*", "*.txt"))):
            shard = p.split("shard=")[1].split("/")[0]
            with open(p) as f:
                order[shard] = [json.loads(line)["doc_id"] for line in f]
        return m, order

    m1, o1 = export(str(tmp_path / "e1"), epoch=1)
    m1b, o1b = export(str(tmp_path / "e1b"), epoch=1)
    m2, o2 = export(str(tmp_path / "e2"), epoch=2)

    assert o1 == o1b  # reproducible per epoch
    assert o1 != o2  # a real permutation change across epochs
    for shard in o1:
        assert sorted(o1[shard]) == sorted(o2[shard])  # same membership
    assert [s["checksum"] for s in m1["shards"]] == [
        s["checksum"] for s in m2["shards"]
    ]
    assert verify_manifest(spark, str(tmp_path / "e2"))["ok"]
