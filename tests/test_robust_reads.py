"""Ingestion robustness: schema evolution across parquet batches and
corrupt-file tolerance — the read-side contracts a long-lived 100 TB
lake needs (files written over months by evolving producers; the
occasional truncated object after a botched transfer)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_merge_schema_reads_evolved_batches(spark, tmp_path):
    """A column added by a newer producer must surface (NULL for old
    files) under mergeSchema — and stay invisible without it unless
    the footer sampled happens to carry it."""
    d = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id")).write.parquet(d)
    spark.range(5, 8).select(
        F.col("id"), F.lit("new").alias("extra")
    ).write.mode("append").parquet(d)

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert len(rows) == 8
    assert rows[0] is None and rows[7] == "new"


def test_ignore_corrupt_files(spark, tmp_path):
    """With ignoreCorruptFiles on, a truncated parquet object costs its
    own rows only; with it off the read fails loudly (the default we
    keep — silent data loss must be opted into)."""
    d = str(tmp_path / "lake")
    spark.range(10).repartition(2).write.parquet(d)
    part = sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )[0]
    victim = os.path.join(d, part)
    with open(victim, "r+b") as f:
        f.truncate(10)  # destroy footer
    crc = os.path.join(d, f".{part}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    with pytest.raises(Exception):
        spark.read.parquet(d).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        # Explicit schema: inference would have to open the corrupt
        # footer before the tolerant scan even starts.
        n = spark.read.schema("id BIGINT").parquet(d).count()
        assert 0 < n < 10
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
