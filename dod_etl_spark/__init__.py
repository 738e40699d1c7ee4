"""dod_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the DOD-ETL reference engine (gustavo-vm/dod-etl): near
real-time star-schema enrichment (stream-to-dimension lookup joins,
interval-overlap temporal joins with grain fan-out, derived OEE metrics),
dimension-replica maintenance (latest-per-key CDC dedup, on-demand key-set
filtering, retention, upsert), plus the large-scale training-data-pipeline
operators (dedup families, similarity search, text analysis, multimodal
column plumbing) that a 100 TB corpus pipeline needs.

Design principles (see SURVEY.md §4/§7):
- DataFrame/SQL declarative plans; Catalyst + Tungsten pick physical
  strategy. No RDDs, no row-at-a-time Python in hot paths.
- Broadcast joins for small dimensions, AQE for skew, explicit
  partitioning knobs only where Catalyst can't infer them.
- Every operator is a pure DataFrame -> DataFrame function: identical
  code serves batch and Structured Streaming (stream-static joins).
"""

__version__ = "0.1.0"
