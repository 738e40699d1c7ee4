"""SparkSession factory tuned for the engine.

Local-mode testing uses local[N]; the same conf block is what we would
ship on a 1000-executor cluster (AQE, skew-join handling, UTC session
timezone for cross-engine determinism, Arrow for the sanctioned
Pandas-UDF extension surface).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partitions: ~cores in local mode. On a real cluster this is
# left to AQE (advisory target partition size) — AQE coalesces/splits
# post-shuffle partitions at runtime, so the static number only seeds it.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "dod_etl_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    The conf choices and why they survive a 100 TB scale-up:
    - adaptive.enabled + coalescePartitions + skewJoin: runtime re-plan
      fixes shuffle-partition sizing and skewed join keys without manual
      salting in the common case.
    - autoBroadcastJoinThreshold left at default (10 MB) but all known
      small dimensions are explicitly broadcast() in operator code, so
      plans do not silently degrade to sort-merge when stats are missing.
    - session timezone pinned UTC: deterministic timestamp semantics,
      matching the DuckDB oracle and any downstream engine.
    - Arrow enabled: Pandas-UDF extension surface (minhash/multimodal)
      moves data in columnar batches, not pickled rows.
    """
    cpus = str(cpus or _DEFAULT_CPUS)
    # Python workers unpickle Pandas-UDF/mapInPandas closures by importing
    # this package — they inherit PYTHONPATH from the driver process, NOT
    # the driver's runtime sys.path. Exporting the repo root here makes
    # the Arrow extension surface work regardless of the caller's cwd.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
