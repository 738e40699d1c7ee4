"""Continuous per-key data profiling: one foreachBatch body feeding the
three maintain-don't-rebuild profile stores, one joined serve frame.

A 100 TB ingest wants a LIVE answer to "what does this key's data look
like so far" — row volume, distinct cardinality, value distribution,
dominant values — without any per-batch history rescan. Each facet
already has its store with the right mergeable summary:

- exact rows + distinct: HllSketchStore (union = register-wise max);
- distribution: QuantileStore (log-bin histogram, exact integer merge);
- dominant values: FrequencyStore (Count-Min + candidate union).

This module is deliberately thin composition — update_batch fans the
SAME micro-batch into the three stores (each gates its own replay
safety; the frequency/quantile stores share the batch_id the stream
provides), and profile() joins their serves on the key. The exact row
count rides the quantile store's histogram (sum of bin counts is exact
by construction), so no fourth table is needed.

The value of the composition is operational: ONE foreachBatch body, one
commit cadence, one compact()/merge_rows() maintenance surface — the
shape a production ingest actually deploys.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dod_etl_spark.streaming.frequency_store import FrequencyStore
from dod_etl_spark.streaming.quantile_store import QuantileStore
from dod_etl_spark.streaming.sketch_store import HllSketchStore


@dataclass
class StreamingProfiler:
    """Per-key continuous profile over a (key, value) stream."""

    spark: SparkSession
    prefix: str = "profile"
    n_buckets: int = 16
    hll: HllSketchStore = field(init=False)
    quant: QuantileStore = field(init=False)
    freq: FrequencyStore = field(init=False)

    def __post_init__(self) -> None:
        p = self.prefix
        self.hll = HllSketchStore(
            self.spark, table=f"{p}_hll", n_buckets=self.n_buckets
        )
        self.quant = QuantileStore(
            self.spark,
            table=f"{p}_qh",
            commits_table=f"{p}_qc",
            n_buckets=self.n_buckets,
        )
        self.freq = FrequencyStore(
            self.spark,
            cm_table=f"{p}_cm",
            cand_table=f"{p}_cand",
            commits_table=f"{p}_fc",
            n_buckets=self.n_buckets,
        )

    def update_batch(
        self,
        batch: DataFrame,
        batch_id: int,
        key_col: str = "key",
        value_col: str = "value",
    ) -> None:
        """foreachBatch body. Checkpoint once so the three store
        updates share one materialization of the micro-batch instead
        of re-running its lineage three times."""
        b = batch.localCheckpoint(eager=True)
        # hll_sketch_agg takes int/long/string/binary — profile values
        # are numeric; the string form preserves distinctness exactly.
        self.hll.update_batch(
            b.withColumn(value_col, F.col(value_col).cast("string")),
            key_col=key_col,
            value_col=value_col,
        )
        self.quant.update_batch(
            b, batch_id=batch_id, key_col=key_col, value_col=value_col
        )
        self.freq.update_batch(
            b, batch_id=batch_id, key_col=key_col, value_col=value_col
        )

    def profile(
        self, probs: tuple[float, ...] = (0.5, 0.95, 0.99), k: int = 5
    ) -> DataFrame:
        """(key, n_rows, n_distinct, q<pct> per prob, top_values): the
        live profile. n_rows is exact (histogram bin-count sum); quantile
        estimates are within sqrt(1+eps); n_distinct is HLL (~1.6%);
        top_values are the k dominant candidates with CM upper-bound
        counts, rank-ordered."""
        n_rows = self.quant.histogram().groupBy("key").agg(
            F.sum("n").alias("n_rows")
        )
        q = self.quant.quantiles(list(probs))
        qwide = q.groupBy("key").pivot(
            "p", [float(p) for p in probs]
        ).agg(F.first("estimate"))
        for p in probs:
            qwide = qwide.withColumnRenamed(str(float(p)), f"q{int(p * 100)}")
        hh = (
            self.freq.heavy_hitters(k)
            .groupBy("key")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rank", "value", "est"))
                    ),
                    lambda s: F.struct(
                        s["value"].alias("value"), s["est"].alias("est")
                    ),
                ).alias("top_values")
            )
        )
        return (
            n_rows.join(self.hll.estimates(), "key", "left")
            .join(qwide, "key", "left")
            .join(hh, "key", "left")
        )
