"""OEE metric computation — F6 — as pure column arithmetic.

Reference formula (stp/DataTransformer.scala:102-142; intended semantics
per SURVEY §2.10 item 3 — grain ids emitted correctly):

    factDur    = FACT_END - FACT_START          (ms, double)
    prodDur    = PROD_END - PROD_START
    plannedDur = PLANNED_END - PLANNED_START
    off          = STATUS_TYPE contains "OFF"
    splitFactor  = off ? 0 : factDur / prodDur
    prodFactor   = off ? 0 : prodDur / plannedDur
    performance  = splitFactor * (QUANTITY / (prodFactor * PLANNED_QUANTITY))
    availability = off ? 0 : 1
    quality      = IS_OUT_OF_SPECIFICATION ? 0 : 1
    oee          = performance * availability * quality

All when/otherwise chains on native columns — zero UDFs, fully inside
whole-stage codegen (this is the property that makes the metric free at
100 TB: it fuses into the join-probe stage).

Division-by-zero handling: the reference computes in JVM doubles, so an
OFF grain yields 0 * (qty/0) = NaN, scrubbed to 0.0 at the sink (F9,
utils/JDBCSink.scala:21). We guard structurally instead — a CASE branch
keeps degenerate denominators out of the division entirely — which (a)
produces the same 0.0 the reference's NaN guard produced, (b) is safe
under Spark's ANSI mode (default since 4.0, where /0 raises), and
(c) matches the DuckDB oracle expression exactly. Deviation note: a
non-OFF grain with prodDur=0 gave the reference +Inf at the sink; we
emit 0.0 (documented, SURVEY §2.10 spirit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import duration_ms, nan_to_zero, stable_round
from dod_etl_spark.schemas import OEE_COLUMNS


def _zero_if(cond: Column, value: Column) -> Column:
    return F.when(cond, F.lit(0.0)).otherwise(value)


def compute_oee(
    grains: DataFrame,
    round_digits: int | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """F6 + P5 projection: fact grains -> 9-column OEE frame
    (FIXTURES.md §6). `extra_cols` are carried through (e.g. SHIFT_CODE
    after the period-shift enrichment)."""
    off = F.col("STATUS_TYPE").contains("OFF")  # P10 (DataTransformer.scala:116)
    fact_dur = duration_ms(F.col("FACT_START_TIME"), F.col("FACT_END_TIME"))
    prod_dur = duration_ms(F.col("PROD_START_TIME"), F.col("PROD_END_TIME"))
    planned_dur = duration_ms(F.col("PLANNED_START_TIME"), F.col("PLANNED_END_TIME"))

    valid = (
        (~off)
        & (prod_dur > 0)
        & (planned_dur > 0)
        & (F.col("PLANNED_QUANTITY") > 0)
        & (F.col("QUANTITY").isNotNull())
    )
    # splitFactor * (QUANTITY / (prodFactor * PLANNED_QUANTITY)), guarded.
    perf_expr = (fact_dur / prod_dur) * (
        F.col("QUANTITY") / ((prod_dur / planned_dur) * F.col("PLANNED_QUANTITY"))
    )
    performance = F.when(valid, perf_expr).otherwise(F.lit(0.0))
    availability = _zero_if(off, F.lit(1.0))
    quality = _zero_if(F.coalesce(F.col("IS_OUT_OF_SPECIFICATION"), F.lit(False)), F.lit(1.0))

    performance = F.coalesce(nan_to_zero(performance), F.lit(0.0))
    oee = performance * availability * quality

    out = grains.select(
        "ID",
        "ID_PRODUCTION_ORDER",
        "ID_MATERIAL",
        "ID_EQUIPMENT_STATUS",
        "COD_EQUIPMENT",
        performance.alias("PERFORMANCE"),
        availability.alias("AVAILABILITY"),
        quality.alias("QUALITY"),
        oee.alias("OEE"),
        *extra_cols,
    )
    if round_digits is not None:
        for c in ("PERFORMANCE", "AVAILABILITY", "QUALITY", "OEE"):
            out = out.withColumn(c, stable_round(F.col(c), round_digits))
    assert out.columns == [*OEE_COLUMNS, *extra_cols]
    return out


def oee_csv_lines(oee: DataFrame) -> DataFrame:
    """A4: the reference's collapse of a batch of OEE values into one
    comma-joined line (BeamStreamProcessor.scala:107-116). Kept for
    parity; values sorted for determinism (the reference relied on
    arrival order). The useful per-grain frame is `compute_oee`'s."""
    return oee.agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("OEE")), lambda x: x.cast("string")),
            ",",
        ).alias("line")
    )
