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
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"


def shard_column(key, n_shards: int):
    """Deterministic shard id in [0, n_shards) from a key column."""
    return F.pmod(F.xxhash64(key), F.lit(n_shards)).cast("int")


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
    base = os.path.abspath(dest)
    for r in per_file:
        path = os.path.abspath(r["_file"].replace("file:", ""))
        out.append(
            {
                "file": os.path.relpath(path, base),
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
) -> dict:
    """Export `df` as exactly `n_shards` parquet files plus a manifest.

    Layout is Hive-partitioned `dest/shard=K/part-*.parquet`, one file
    per shard: the frame is hash-repartitioned on the shard id (one
    shuffle) and written partitionBy(shard), so each shard's rows live
    in exactly one task — a task whose partition carries two colliding
    shard ids simply writes one file into each directory. Returns the
    manifest dict: schema, shard count, total rows, and per-shard
    {file, rows, bytes, checksum}. The shard a row lands in is a pure
    function of its `shard_key` value — stable across runs,
    partitionings, and cluster sizes."""
    spark = df.sparkSession
    out = df.withColumn("shard", shard_column(F.col(shard_key), n_shards))
    out = out.repartition(n_shards, F.col("shard"))
    out.write.mode("overwrite").partitionBy("shard").parquet(dest)

    back = spark.read.parquet(dest)
    stats = _file_stats(back, dest)
    sizes = {}
    for root, _dirs, files in os.walk(dest):
        for name in files:
            if name.endswith(".parquet"):
                p = os.path.join(root, name)
                sizes[os.path.relpath(p, os.path.abspath(dest))] = os.path.getsize(p)
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
    with open(os.path.join(dest, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_manifest(spark: SparkSession, dest: str) -> dict:
    """Re-derive per-file stats from the data and compare with the
    stored manifest. Returns {"ok": bool, "errors": [...]} — the check
    a trainer runs after transferring shards to its filesystem."""
    with open(os.path.join(dest, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    actual = {s["file"]: s for s in _file_stats(spark.read.parquet(dest), dest)}
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
