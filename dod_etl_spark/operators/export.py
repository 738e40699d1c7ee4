"""Training-data export: deterministic sharded writes with a
checksummed manifest.

The last stage of a curation pipeline hands the corpus to a TRAINING
system, which has different needs than a warehouse: a fixed shard
count (data-parallel readers map shards to workers), deterministic
doc->shard assignment (resumable/reproducible epochs), and a manifest
the trainer can verify before burning accelerator hours on a corrupt
or truncated transfer.

Scale design
------------
- Shard assignment is CONTENT-HASHED (pmod(xxhash64(key), n_shards)),
  not round-robin or rand(): the same corpus exports identically on
  any cluster size / partitioning — the same engine-invariance
  contract as operators/sampling.py. repartition(n_shards, shard) is
  ONE hash shuffle; each shard lands as exactly one parquet file via
  partitionBy-free single-file-per-partition writing.
- The manifest is computed by READING BACK what was written (grouped
  by input file), not by trusting the writer: row count and an
  order-insensitive value checksum (sum + bit_xor of xxhash64 over the
  full row struct) per shard file, plus byte size from the file
  system. A reader can re-run `verify_manifest` after any copy and
  compare checksums without knowing anything about the producing job.
- Checksums are order-insensitive aggregates, so verification is
  shard-parallel and never sorts.
- Manifest I/O and file-size listing go through the HADOOP FileSystem
  API (resolved from the destination's scheme), not os.walk/open, so
  hdfs:// and s3a:// destinations produce and verify the same manifest
  a local run does. input_file_name() values are parsed as URIs and
  compared by path, never by raw-string prefix stripping.
- `n_shards` is an upper bound on file count: shard ids with zero rows
  write no file, so a sparse keyspace can yield fewer than n_shards
  files (the manifest records the actual count).
"""

from __future__ import annotations

import json
import os
import posixpath
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"


def _uri_path(uri_or_path: str) -> str:
    """The path component of a file URI (`file:///a/b`, `hdfs://nn/a`,
    `s3a://bucket/a`) or a bare path, percent-decoded — the common
    coordinate system for comparing input_file_name() against a
    destination across schemes."""
    parsed = urlparse(uri_or_path)
    # input_file_name() returns percent-encoded URIs ('%20' for a space
    # in the destination); the bare-path dest side is raw — decode the
    # URI side or the relpath join silently escapes the destination and
    # every size lookup misses (r6 review finding).
    path = unquote(parsed.path) if parsed.scheme else uri_or_path
    if not parsed.scheme:
        path = os.path.abspath(path)
    return path


def _hadoop_fs(spark: SparkSession, dest: str):
    """(FileSystem, qualified Path, jvm) for `dest`, scheme-resolved —
    LocalFileSystem for bare paths, S3A/HDFS/... when the URI says so."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dest)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, fs.makeQualified(jpath), jvm


def _fs_read_text(spark: SparkSession, dest: str, name: str) -> str:
    fs, jpath, jvm = _hadoop_fs(spark, dest)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(jpath, name))
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _fs_write_text(spark: SparkSession, dest: str, name: str, text: str) -> None:
    fs, jpath, jvm = _hadoop_fs(spark, dest)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(jpath, name), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_file_sizes(
    spark: SparkSession, dest: str, suffixes: tuple[str, ...] = (".parquet",)
) -> dict[str, int]:
    """{relative file path: bytes} for every data file under dest
    matching one of `suffixes`, via FileSystem.listFiles — works on any
    supported scheme."""
    fs, jpath, _jvm = _hadoop_fs(spark, dest)
    base = jpath.toUri().getPath()
    sizes: dict[str, int] = {}
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toUri().getPath()
        if p.endswith(suffixes):
            sizes[posixpath.relpath(p, base)] = st.getLen()
    return sizes


def shard_column(key, n_shards: int):
    """Deterministic shard id in [0, n_shards) from a key column."""
    return F.pmod(F.xxhash64(key), F.lit(n_shards)).cast("int")


def _epoch_order(df: DataFrame, shard_key: str, epoch: int | None) -> DataFrame:
    """Deterministic within-shard training-order shuffle: sort each
    shard's partition by xxhash64(key, epoch) — a reproducible
    permutation that changes completely per epoch, with NO global sort
    (sortWithinPartitions; each shard is one task's partition here).
    The manifest stays valid across epochs because its checksums are
    order-insensitive — same bytes-of-data, different read order."""
    if epoch is None:
        return df
    # Leading with `shard` matters: the partitioned file writer
    # requires each task's rows ordered by the partition columns and
    # inserts its OWN sort (destroying ours) unless the child's
    # ordering already starts with them.
    return df.sortWithinPartitions(
        F.col("shard"), F.xxhash64(F.col(shard_key), F.lit(epoch)), F.col(shard_key)
    )


def _file_stats(df: DataFrame, dest: str) -> list[dict]:
    """Per-file (path, rows, checksum) by reading the written data back
    grouped on input_file_name() — executor-side, one scan. The
    checksum covers DATA columns only (the shard id lives in the
    path), so it survives re-sharding-agnostic comparisons."""
    cols = [c for c in df.columns if c != "shard"]
    per_file = (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # decimal accumulator: sum() of raw longs overflows under
            # ANSI; bit_xor alone would let duplicated rows cancel.
            F.sum(F.xxhash64(F.struct(*cols)).cast("decimal(38,0)"))
            .cast("string")
            .alias("_sum"),
            F.bit_xor(F.xxhash64(F.struct(*cols))).alias("_xor"),
        )
        .collect()
    )
    out = []
    base = _uri_path(dest)
    for r in per_file:
        path = _uri_path(r["_file"])
        out.append(
            {
                "file": posixpath.relpath(path, base),
                "rows": r["rows"],
                "checksum": f"{r['_sum']}:{r['_xor']}",
            }
        )
    return sorted(out, key=lambda d: d["file"])


def write_shards(
    df: DataFrame,
    dest: str,
    n_shards: int,
    shard_key: str,
    epoch: int | None = None,
) -> dict:
    """Export `df` as up to `n_shards` parquet files plus a manifest
    (shard ids that receive zero rows write no file; the manifest's
    `n_shards` records the actual file count).

    Layout is Hive-partitioned `dest/shard=K/part-*.parquet`, one file
    per shard: the frame is hash-repartitioned on the shard id (one
    shuffle) and written partitionBy(shard), so each shard's rows live
    in exactly one task — a task whose partition carries two colliding
    shard ids simply writes one file into each directory. Returns the
    manifest dict: schema, shard count, total rows, and per-shard
    {file, rows, bytes, checksum}. The shard a row lands in is a pure
    function of its `shard_key` value — stable across runs,
    partitionings, and cluster sizes. `epoch` additionally applies the
    deterministic within-shard training-order shuffle (_epoch_order)."""
    spark = df.sparkSession
    out = df.withColumn("shard", shard_column(F.col(shard_key), n_shards))
    out = out.repartition(n_shards, F.col("shard"))
    out = _epoch_order(out, shard_key, epoch)
    out.write.mode("overwrite").partitionBy("shard").parquet(dest)

    back = spark.read.parquet(dest)
    stats = _file_stats(back, dest)
    sizes = _fs_file_sizes(spark, dest)
    for s in stats:
        s["bytes"] = sizes.get(s["file"], 0)
    manifest = {
        "format": "parquet",
        "n_shards": len(stats),
        "shard_key": shard_key,
        "schema": back.schema.simpleString(),
        "total_rows": sum(s["rows"] for s in stats),
        "shards": stats,
    }
    _fs_write_text(
        spark, dest, MANIFEST_NAME, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def write_jsonl_shards(
    df: DataFrame,
    dest: str,
    n_shards: int,
    shard_key: str,
    compression: str | None = "gzip",
    epoch: int | None = None,
) -> dict:
    """Export `df` as up to `n_shards` JSON-lines files plus the same
    checksummed manifest as write_shards — the trainer-facing text
    format (most LLM data loaders stream jsonl/jsonl.gz, not parquet).

    Every row serializes as one `to_json(struct(<all columns>))` line
    (field order = column order, so the byte stream is deterministic);
    sharding, layout (`dest/shard=K/part-*.txt[.gz]`), manifest
    semantics, and the content-hashed shard assignment contract are
    identical to the parquet path. The manifest checksum hashes the
    SERIALIZED line read back from disk, so verify_manifest detects a
    single flipped byte in any shard after transfer. gzip by default:
    text compresses ~5-10x and every loader streams it; pass
    compression=None for raw .txt."""
    spark = df.sparkSession
    data_cols = [F.col(c) for c in df.columns]
    out = df.withColumn("shard", shard_column(F.col(shard_key), n_shards))
    out = out.repartition(n_shards, F.col("shard"))
    out = _epoch_order(out, shard_key, epoch)
    writer = (
        out.select(F.to_json(F.struct(*data_cols)).alias("value"), "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.text(dest)

    back = spark.read.text(dest)
    stats = _file_stats(back, dest)
    sizes = _fs_file_sizes(spark, dest, (".txt", ".txt.gz", ".gz"))
    for s in stats:
        s["bytes"] = sizes.get(s["file"], 0)
    manifest = {
        "format": "jsonl",
        "compression": compression,
        "n_shards": len(stats),
        "shard_key": shard_key,
        "schema": df.schema.simpleString(),
        "total_rows": sum(s["rows"] for s in stats),
        "shards": stats,
    }
    _fs_write_text(
        spark, dest, MANIFEST_NAME, json.dumps(manifest, indent=1, sort_keys=True)
    )
    return manifest


def verify_manifest(spark: SparkSession, dest: str) -> dict:
    """Re-derive per-file stats from the data and compare with the
    stored manifest. Returns {"ok": bool, "errors": [...]} — the check
    a trainer runs after transferring shards to its filesystem.
    Format-aware: jsonl manifests re-read through the text reader (the
    checksum hashes serialized lines), parquet through the parquet
    reader."""
    manifest = json.loads(_fs_read_text(spark, dest, MANIFEST_NAME))
    reader = (
        spark.read.text if manifest.get("format") == "jsonl" else spark.read.parquet
    )
    actual = {s["file"]: s for s in _file_stats(reader(dest), dest)}
    errors = []
    expected = {s["file"]: s for s in manifest["shards"]}
    for name in sorted(set(expected) | set(actual)):
        if name not in actual:
            errors.append(f"missing shard {name}")
        elif name not in expected:
            errors.append(f"unexpected shard {name}")
        else:
            e, a = expected[name], actual[name]
            if (e["rows"], e["checksum"]) != (a["rows"], a["checksum"]):
                errors.append(
                    f"{name}: rows/checksum {a['rows']}/{a['checksum']} "
                    f"!= manifest {e['rows']}/{e['checksum']}"
                )
    return {"ok": not errors, "errors": errors}
