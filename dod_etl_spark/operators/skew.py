"""Skew-mitigation operators: salted joins and salted heavy aggregation.

AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most
shuffle-join skew at runtime, but it cannot help when (a) the skewed
side feeds a HASH AGGREGATE whose function has no partial combine
(collect_list/collect_set), or (b) the join is stream-static (no AQE
re-plan inside a micro-batch). These operators pre-split hot keys with
a deterministic content-derived salt — the same row salts identically
on any partitioning, so results are reproducible (no rand()).

Reference parity: none — the reference runs single-node (SURVEY §0) and
never meets skew; this is part of the design-for-100TB surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def _content_salt(df: DataFrame, n_salts: int, salt_src: Sequence[str] | None) -> Column:
    """Deterministic salt in [0, n_salts): xxhash64 of non-key columns
    (or all columns), so identical logical rows still spread — xxhash64
    over the full row differs row-to-row for distinct payloads, and for
    true full duplicates the salt collision is harmless (they belong in
    the same group anyway)."""
    cols = [F.col(c) for c in (salt_src or df.columns)]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_src: Sequence[str] | None = None,
) -> DataFrame:
    """Equi join where `skewed` has hot keys and `small` is too large to
    broadcast outright: salt the skewed side, replicate `small`
    n_salts ways, join on (keys + salt).

    Scale math: a key holding p% of the big side spreads over n_salts
    reducers instead of one; the price is an n_salts-way blowup of the
    OTHER side's shuffle (replicate-the-small-side skew join). Use when
    small is 10-100x over the broadcast threshold; below that just
    broadcast, above parity AQE's splitter is usually enough.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        # right/full would emit every unmatched replicated small-side row
        # n_salts times (the small side exists once per salt value).
        raise ValueError(
            f"salted_join supports skewed-side-preserving modes {sorted(allowed)}; "
            f"got how={how!r} — unmatched small-side rows would duplicate "
            f"{n_salts}x under right/full outer joins"
        )
    keys = list(on)
    salted = skewed.withColumn(_SALT, _content_salt(skewed, n_salts, salt_src))
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, keys + [_SALT], how)
    return out.drop(_SALT)


def salted_collect_agg(
    df: DataFrame,
    keys: Sequence[str],
    agg_col: str,
    n_salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """collect_list per key when some keys are hot. collect_list has no
    map-side combine, so a plain groupBy ships every row of the hot key
    to ONE reducer — the classic executor-OOM shape. Two-phase instead:
    group on (key, salt) to build bounded partial lists, then flatten
    the (at most n_salts) partials per key.

    `sort=True` (default) totally orders each final list — deterministic
    output, but the merge-side array_sort of a hot key's full list is
    single-task O(n log n), which caps the wall-time win (the memory win
    — bounded per-reducer list building — remains). `sort=False` skips
    both sorts: element order is then partial-arrival order
    (nondeterministic across runs), the right mode when the consumer
    treats the list as a bag (re-aggregates, explodes, or sorts
    downstream) and phase 2 reduces to a ~n_salts-record flatten.
    """
    keys = list(keys)
    part = F.collect_list(agg_col)
    merged = F.flatten(F.collect_list("_part"))
    if sort:
        part = F.sort_array(part)
        merged = F.array_sort(merged)
    partial = (
        df.withColumn(_SALT, _content_salt(df, n_salts, None))
        .groupBy(*keys, _SALT)
        .agg(part.alias("_part"))
    )
    return partial.groupBy(*keys).agg(merged.alias(f"{agg_col}_list"))
