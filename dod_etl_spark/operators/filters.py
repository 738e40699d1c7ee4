"""On-demand key-set filter (P6) and retention filter (P7).

Reference semantics:
- P6 (imtu/InMemoryTableUpdater.scala:142-146, 182-187): keep a dimension
  record iff its filter-column value is NULL or belongs to the set of
  keys actually observed on the operational stream; the sentinel key
  "NOKEY" disables filtering. This is the paper's "on-demand
  replication" — dimension rows nobody will join against are never
  materialized.
- P7 (imtu/InMemoryTableUpdater.scala:49-57; delete-side TODO :75): keep
  records whose transaction timestamp is within the last N days.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NOKEY = "NOKEY"  # reference wildcard: pass everything


def keyset_filter(
    df: DataFrame,
    filter_column: str,
    keys: Iterable[str] | DataFrame,
) -> DataFrame:
    """P6. Two physical strategies by key-set representation:

    - Literal iterable (driver-known, small): `isin` — pushed into the
      parquet scan as an IN filter (shows up in PushedFilters), so
      filtered row groups are never read.
    - DataFrame of keys (stream-observed, unbounded): broadcast LEFT SEMI
      join — the Spark analog of the reference's shared filterKeySet; no
      shuffle of the big side, the key set ships to executors once.

    NULL filter values always pass (reference keeps them). NULLs in the
    key set itself are dropped before the semi-join so the isNull union
    branch is the ONLY path a NULL-keyed row can take — with eqNullSafe a
    NULL key would match NULL rows in the semi-join AND re-add them via
    the union, duplicating them.
    """
    if isinstance(keys, DataFrame):
        key_df = keys.toDF("__key").filter(F.col("__key").isNotNull()).distinct()
        passing = df.join(
            F.broadcast(key_df),
            df[filter_column] == F.col("__key"),
            "left_semi",
        )
        return passing.unionByName(df.filter(F.col(filter_column).isNull()))
    keys = list(keys)
    if NOKEY in keys:
        return df
    return df.filter(F.col(filter_column).isNull() | F.col(filter_column).isin(keys))


def retention_filter(
    df: DataFrame,
    ts_column: str,
    retention_days: int,
    now: Column | None = None,
) -> DataFrame:
    """P7: rows with ts within [now - retention_days, now].

    `now` defaults to current_timestamp(); tests and oracle queries pass
    a deterministic anchor (e.g. max(ts) of the table). The predicate is
    a plain comparison -> pushed to the scan; on time-partitioned storage
    it also prunes partitions.
    """
    ts = F.col(ts_column)
    anchor = now if now is not None else F.current_timestamp()
    return df.filter(ts >= anchor - F.expr(f"INTERVAL {int(retention_days)} DAYS"))
