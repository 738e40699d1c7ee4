"""Corrupt-record quarantine for the JSON parse path.

At 100 TB some fraction of every real feed is malformed; the two
failure modes to avoid are (a) FAILFAST killing a 6-hour job on row
four billion and (b) silent nulls flowing into metrics. This splits the
parse into good/quarantine branches in ONE pass — the quarantine branch
keeps the raw payload for replay after the producer is fixed.

Reference parity: the reference's per-event Map parse
(UtilDODETL.scala:35-38) throws on malformed JSON and kills the Beam
bundle — this is the intended-robustness version of P1/F10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def parse_with_quarantine(
    raw: DataFrame,
    payload_col: str,
    schema: StructType,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (good, quarantine).

    good: parsed+flattened typed columns. quarantine: the ORIGINAL rows
    (raw payload intact) that failed to parse or are missing a required
    field. Both branches derive from one projection over one scan — the
    split is two filters on the same parsed column, which Catalyst
    collapses into the scan (no second parse, no shuffle); a cached
    upstream or foreachBatch batch evaluates from_json once.
    """
    # PERMISSIVE from_json yields an all-null struct (not NULL) for
    # malformed input, so corruption is detected the supported way: a
    # columnNameOfCorruptRecord field that Spark populates with the raw
    # text only when the parse failed.
    corrupt = "_corrupt_record"
    probe = StructType(schema.fields + [StructField(corrupt, StringType())])
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(
            F.col(payload_col), probe, {"columnNameOfCorruptRecord": corrupt}
        ),
    )
    ok: Column = F.col(f"_parsed.{corrupt}").isNull()
    for field in required or []:
        ok = ok & F.col(f"_parsed.{field}").isNotNull()
    good = parsed.filter(ok).select(
        *[F.col(f"_parsed.{f.name}") for f in schema.fields]
    )
    quarantine = parsed.filter(~ok).drop("_parsed")
    return good, quarantine
