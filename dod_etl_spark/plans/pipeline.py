"""End-to-end OEE pipeline plan — the reference's whole dataflow as one
declarative DataFrame expression.

Reference: stp/BeamStreamProcessor.scala:37-121 wires Kafka -> JSON parse
-> per-event H2 lookups -> interval split -> OEE -> text sink as three
Beam MapElements stages plus side-threaded dimension updaters. Here the
same semantics are one Catalyst plan; batch and streaming share it
(streaming/ wraps these functions with readStream inputs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from dod_etl_spark.operators.dedup import latest_per_key
from dod_etl_spark.operators.enrich import (
    build_fact_grains,
    enrich_with_orders,
    normalize_events,
    split_missing_po,
    split_uncovered_es,
)
from dod_etl_spark.operators.oee import compute_oee


@dataclass
class OeeResult:
    """All pipeline outputs; each field is a lazy DataFrame."""

    enriched: DataFrame
    grains: DataFrame
    oee: DataFrame
    missing_po: DataFrame  # J5 retry stream (dimension not yet arrived)
    uncovered: DataFrame  # P9 retry stream (status coverage incomplete)


def dedup_dims(dim: DataFrame, key: str = "ID", ts: str = "DT_LAST_MODIFICATION") -> DataFrame:
    """A1 applied to a CDC dimension snapshot: last version per key wins."""
    return latest_per_key(dim, [key], [ts])


def run_oee_pipeline(
    events: DataFrame,
    production_order: DataFrame,
    product_quality: DataFrame,
    equipment_status: DataFrame,
    dims_are_cdc: bool = False,
    round_digits: int | None = None,
) -> OeeResult:
    """The flagship query. `dims_are_cdc=True` first compacts each
    dimension to latest-per-ID (the IMTU replay semantics)."""
    if dims_are_cdc:
        production_order = dedup_dims(production_order)
        product_quality = dedup_dims(product_quality)
        equipment_status = dedup_dims(equipment_status)

    ev = normalize_events(events)
    enriched = enrich_with_orders(ev, production_order, product_quality)
    ok, missing_po = split_missing_po(enriched)
    grains = build_fact_grains(ok, equipment_status)
    uncovered = split_uncovered_es(ev, grains)
    oee = compute_oee(grains, round_digits=round_digits)
    return OeeResult(
        enriched=enriched,
        grains=grains,
        oee=oee,
        missing_po=missing_po,
        uncovered=uncovered,
    )
