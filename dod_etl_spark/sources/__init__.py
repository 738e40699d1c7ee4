"""Sources: the reference's S1-S4/S8 ingestion surfaces, Spark-first.

Kafka readers are config-driven builders (no broker in CI — covered by
construction tests + file-based stream twins); Parquet is the added
batch-mode source (TESTDATA.md); JDBC is the S4 fallback.
"""
