"""Stream-to-dimension enrichment (J1/J2), missing-data routing (J5,
P8/P9), and the fact-grain builder — the heart of the OEE pipeline.

Reference dataflow (stp/BeamStreamProcessor.scala:66-105 +
stp/DataTransformer.scala): every fact event issues per-event SQL lookups
against a per-worker H2 replica — an index-nested-loop join driven by
the stream. Spark-first: the whole thing is ONE declarative plan —

    events ⟕ broadcast(production_order) ⟕ broadcast(product_quality)
           ⋈ equipment_status ON equi key + interval overlap
           -> grain intersection columns

Catalyst plans BroadcastHashJoins for the dims (the per-worker-replica
idea, minus the hand-rolled machinery) and the overlap join per
interval_join.py. Missing-dimension events are routed with a filter on
null-join flags (P8) / coverage predicate (P9) instead of the
reference's retry buffer; streaming retry semantics live in
streaming/late_data.py.

Intended-semantics fixes over reference bugs (SURVEY §2.10): the J1
lookup joins on the event's ID_PRODUCTION_ORDER (not the hard-coded
`WHERE PO.ID = 1`, DataTransformer.scala:27); grain ids are emitted
correctly (not the absent-key None lookups of DataTransformer.scala:
137-138); ES coverage uses max(END_TIME), not list order (:86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dod_etl_spark.functions.scalar import epoch_ms_to_ts
from dod_etl_spark.operators.interval_join import grain_split, overlap_join_bucketed


def normalize_events(events: DataFrame) -> DataFrame:
    """P1/F1: epoch-millis fact stream -> typed timestamps.

    Reference parses JSON to Map and casts per access
    (UtilDODETL.scala:35-38, DataTransformer.scala:22-23); we convert
    once at the boundary."""
    return events.withColumn("START_TIME", epoch_ms_to_ts("START_TIME")).withColumn(
        "END_TIME", epoch_ms_to_ts("END_TIME")
    )


def enrich_with_orders(
    events: DataFrame,
    production_order: DataFrame,
    product_quality: DataFrame,
) -> DataFrame:
    """J1+J2: events ⟕ PO on ID_PRODUCTION_ORDER=PO.ID, ⟕ PQ on
    PQ.ID_PRODUCT = event.ID. Output shape = reference's 11-column
    enrichment projection P2 (DataTransformer.scala:32-35).

    Dims are broadcast: on a 1000-executor cluster the dimension
    snapshot ships once per executor (the reference's per-worker H2
    replica, done by the engine)."""
    po = F.broadcast(
        production_order.select(
            F.col("ID").alias("_PO_ID"),
            "ID_MATERIAL",
            "PLANNED_START_TIME",
            "PLANNED_END_TIME",
            "PLANNED_QUANTITY",
        )
    )
    pq = F.broadcast(
        product_quality.select(
            F.col("ID_PRODUCT").alias("_PQ_ID_PRODUCT"),
            "IS_OUT_OF_SPECIFICATION",
        )
    )
    out = (
        events.join(po, events["ID_PRODUCTION_ORDER"] == po["_PO_ID"], "left")
        .join(pq, events["ID"] == pq["_PQ_ID_PRODUCT"], "left")
    )
    return out.select(
        "ID",
        "ID_PRODUCTION_ORDER",
        "ID_MATERIAL",
        "COD_EQUIPMENT",
        "PLANNED_START_TIME",
        "PLANNED_END_TIME",
        "START_TIME",
        "END_TIME",
        "PLANNED_QUANTITY",
        "QUANTITY",
        "IS_OUT_OF_SPECIFICATION",
    )


def split_missing_po(enriched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P8/J5: route events whose production-order lookup found nothing
    (missing-dimension predicate, BeamStreamProcessor.scala:83) to the
    retry stream."""
    ok = enriched.filter(F.col("ID_MATERIAL").isNotNull())
    missing = enriched.filter(F.col("ID_MATERIAL").isNull())
    return ok, missing


def build_fact_grains(
    enriched: DataFrame,
    equipment_status: DataFrame,
) -> DataFrame:
    """J3+J4: overlap-join enriched events with equipment status and emit
    one fact grain per overlap with the interval intersection.

    Output = reference's 16-column fact-grain projection P4
    (DataTransformer.scala:90-94)."""
    es = equipment_status.select(
        F.col("ID").alias("ID_EQUIPMENT_STATUS"),
        "COD_EQUIPMENT",
        F.col("START_TIME").alias("ES_START_TIME"),
        F.col("END_TIME").alias("ES_END_TIME"),
        "STATUS_TYPE",
        "IS_FREE_TIME",
    )
    # Bucketed decomposition: equipment codes are few (low-cardinality
    # key), so a plain equi join on COD_EQUIPMENT degenerates to a
    # per-key nested loop over the residual range predicate. Blocking on
    # (key, hour-bucket) keeps it a true hash join at any scale.
    joined = overlap_join_bucketed(
        enriched,
        es,
        on=["COD_EQUIPMENT"],
        l_start="START_TIME",
        l_end="END_TIME",
        r_start="ES_START_TIME",
        r_end="ES_END_TIME",
    )
    grains = grain_split(
        joined, "START_TIME", "END_TIME", "ES_START_TIME", "ES_END_TIME"
    )
    return grains.select(
        "ID",
        "ID_PRODUCTION_ORDER",
        "ID_MATERIAL",
        "ID_EQUIPMENT_STATUS",
        "COD_EQUIPMENT",
        "PLANNED_START_TIME",
        "PLANNED_END_TIME",
        "FACT_START_TIME",
        "FACT_END_TIME",
        F.col("START_TIME").alias("PROD_START_TIME"),
        F.col("END_TIME").alias("PROD_END_TIME"),
        "PLANNED_QUANTITY",
        "QUANTITY",
        "IS_OUT_OF_SPECIFICATION",
        "STATUS_TYPE",
        "IS_FREE_TIME",
    )


def enrich_with_shift(grains: DataFrame, period_shift: DataFrame) -> DataFrame:
    """Third enrichment join: attach the work shift whose interval
    overlaps the fact grain — the PERIOD_SHIFT processing the reference
    configured but left TODO (conf/tableConfig.json:12-21,
    stp/BeamStreamProcessor.scala:87; SURVEY §2.10 item 6). Same J3
    shape; a grain spanning a shift boundary fans out per shift."""
    ps = period_shift.select(
        F.col("ID").alias("ID_PERIOD_SHIFT"),
        "COD_EQUIPMENT",
        F.col("START_TIME").alias("PS_START_TIME"),
        F.col("END_TIME").alias("PS_END_TIME"),
        "SHIFT_CODE",
    )
    return overlap_join_bucketed(
        grains,
        ps,
        on=["COD_EQUIPMENT"],
        l_start="FACT_START_TIME",
        l_end="FACT_END_TIME",
        r_start="PS_START_TIME",
        r_end="PS_END_TIME",
    ).drop("PS_START_TIME", "PS_END_TIME")


def split_uncovered_es(events: DataFrame, grains: DataFrame) -> DataFrame:
    """P9: events not fully covered by equipment-status intervals —
    either no grain at all, or max(grain FACT_END) < event END_TIME.
    Reference checked `ESList.last` (scan-order dependent,
    BeamStreamProcessor.scala:86); we use an explicit max."""
    coverage = grains.groupBy("ID").agg(F.max("FACT_END_TIME").alias("_max_end"))
    out = events.join(coverage, "ID", "left")
    return out.filter(
        F.col("_max_end").isNull() | (F.col("_max_end") < F.col("END_TIME"))
    ).drop("_max_end")
