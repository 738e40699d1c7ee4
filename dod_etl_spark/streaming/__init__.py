"""Structured Streaming layer: the reference's streaming architecture
(stp/ + imtu/) re-expressed as Spark streaming queries.

Batch/stream parity by construction: all transformation logic lives in
operators/ and plans/ as plain DataFrame functions; this package only
adds readStream sources, watermarks, stateful retry, and sinks around
them (SURVEY §7.2 phase 2-3).
"""
