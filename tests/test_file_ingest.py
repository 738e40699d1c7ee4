"""Multi-format ingestion (sources/files.py): a corpus exported to
JSONL shards reads back byte-identical through read_jsonl_quarantined,
malformed lines land in quarantine instead of silently vanishing, and
the CSV path survives embedded newlines/quotes in document text."""

from __future__ import annotations

import glob
import gzip

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dod_etl_spark.catalog import load_table
from dod_etl_spark.operators.export import write_jsonl_shards
from dod_etl_spark.sources.files import (
    read_csv_quarantined,
    read_jsonl_quarantined,
)
from tests.conftest import SF_SMOKE

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def _rows(df):
    return sorted(tuple(r) for r in df.select(*DOC_SCHEMA.fieldNames()).collect())


def test_jsonl_roundtrip_is_lossless(spark, tmp_path):
    docs = _docs(spark)
    dest = str(tmp_path / "jsonl")
    write_jsonl_shards(docs, dest, n_shards=4, shard_key="doc_id")
    good, quarantine = read_jsonl_quarantined(
        spark, f"{dest}/shard=*/*.txt.gz", DOC_SCHEMA
    )
    assert quarantine.count() == 0
    assert _rows(good) == _rows(docs)


def test_jsonl_malformed_lines_quarantined_not_dropped(spark, tmp_path):
    docs = _docs(spark).limit(20)
    dest = tmp_path / "jsonl_bad"
    write_jsonl_shards(docs, str(dest), n_shards=1, shard_key="doc_id")
    shard_dir = glob.glob(f"{dest}/shard=*")[0]
    with gzip.open(f"{shard_dir}/part-zz-bad.txt.gz", "wt") as f:
        f.write('{"doc_id": "not a number", "text": 3}\n')
        f.write("this is not json at all\n")
    good, quarantine = read_jsonl_quarantined(spark, f"{dest}/shard=*/*.txt.gz", DOC_SCHEMA)
    assert good.count() == 20
    bad = {r["raw_line"] for r in quarantine.collect()}
    assert bad == {
        '{"doc_id": "not a number", "text": 3}',
        "this is not json at all",
    }


def test_csv_roundtrip_with_embedded_newlines(spark, tmp_path):
    rows = [
        (1, 'line one\nline two with "quotes" and, commas', "en", "s1", 40),
        (2, "plain", "en", "s2", 5),
        (3, 'trailing newline\n', "de", "s1", 17),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    dest = str(tmp_path / "csv")
    (
        df.coalesce(1)
        .write.option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        # writer-side trimming is ON by default and would eat the
        # trailing newline in doc 3's text
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(dest)
    )
    good, quarantine = read_csv_quarantined(
        spark, dest, DOC_SCHEMA, multi_line=True
    )
    assert quarantine.count() == 0
    assert _rows(good) == sorted(rows)


def test_csv_type_violations_quarantined(spark, tmp_path):
    dest = tmp_path / "csv_bad"
    dest.mkdir()
    (dest / "part.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,s1,2\n"
        "zzz,broken,en,s1,6\n"
        "2,ok2,en,s1,3\n"
    )
    good, quarantine = read_csv_quarantined(spark, str(dest), DOC_SCHEMA)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert quarantine.count() == 1
    assert "zzz" in quarantine.first()["raw_line"]


def test_schema_object_not_mutated(spark, tmp_path):
    """StructType.add mutates in place — the readers must not grow the
    caller's schema with _corrupt_record."""
    dest = tmp_path / "csv_s"
    dest.mkdir()
    (dest / "p.csv").write_text("doc_id,text,lang,source,n_chars\n1,a,en,s,1\n")
    n_before = len(DOC_SCHEMA.fields)
    read_csv_quarantined(spark, str(dest), DOC_SCHEMA)
    read_jsonl_quarantined(spark, str(dest), DOC_SCHEMA)  # schema misuse is fine
    assert len(DOC_SCHEMA.fields) == n_before
