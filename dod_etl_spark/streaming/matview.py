"""Incrementally-maintained aggregate materialized view.

A streaming pipeline usually needs a continuously-fresh summary table
(per-key counts / sums / mins / maxes / approx-distincts) that BI and
monitoring read while ingestion runs. Recomputing the aggregate from
the full history every batch is O(history); holding it in Structured
Streaming operator state couples the summary's lifetime to one query's
checkpoint. This maintainer keeps the summary as MERGEABLE PARTIAL
STATE in a versioned-parquet snapshot (the streaming/dimensions.py
publication scheme): each micro-batch contributes its map-side-combined
partial aggregate, the merge is an algebraic fold over (old state ∪
batch partial), and the cost per batch is O(batch + |keys|) — never
O(history).

Mergeability is the design constraint: every supported metric is a
commutative monoid (count/sum by addition — sums in DECIMAL(38,6) so
merge order can't change the result; min/max by lattice ops;
approx-distinct by HLL sketch union, the same mergeable-sketch posture
as functions/sketches.py). AVG is intentionally absent: readers derive
it as sum/count — storing it would break mergeability.

Exactly-once under foreachBatch redelivery: the snapshot directory
carries the last applied batch_id; a replayed batch (same or lower id)
is a no-op, the same stamp discipline as jdbc_idempotent_writer.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# kind -> (partial agg over raw col, merge agg over state col, final expr)
_KINDS = ("count", "sum", "min", "max", "approx_distinct")


@dataclass
class Metric:
    name: str
    kind: str
    col: str | None = None  # unused for count

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown metric kind {self.kind!r} (want {_KINDS})")
        if self.kind != "count" and self.col is None:
            raise ValueError(f"metric {self.name}: kind {self.kind} needs a column")

    def partial(self):
        if self.kind == "count":
            return F.count(F.lit(1)).alias(self.name)
        c = F.col(self.col)
        if self.kind == "sum":
            return F.sum(c.cast("decimal(38,6)")).alias(self.name)
        if self.kind == "min":
            return F.min(c).alias(self.name)
        if self.kind == "max":
            return F.max(c).alias(self.name)
        return F.hll_sketch_agg(c).alias(self.name)

    def merge(self):
        c = F.col(self.name)
        if self.kind in ("count", "sum"):
            return F.sum(c).alias(self.name)
        if self.kind == "min":
            return F.min(c).alias(self.name)
        if self.kind == "max":
            return F.max(c).alias(self.name)
        return F.hll_union_agg(c).alias(self.name)

    def final(self):
        c = F.col(self.name)
        if self.kind == "approx_distinct":
            return F.hll_sketch_estimate(c).alias(self.name)
        if self.kind == "sum":
            return c.cast("double").alias(self.name)
        return c.alias(self.name)


@dataclass
class AggMatView:
    """Maintain `<name>` (finalized view) + `<name>__state` (mergeable
    partials) from micro-batches. Use `.foreach_batch` as the
    writeStream foreachBatch body, or call apply_batch directly in
    batch tests (parity by construction)."""

    spark: SparkSession
    name: str
    key_cols: list[str]
    metrics: list[Metric]
    snapshot_dir: str | None = None
    keep_versions: int = 2
    _version: int = field(default=0, init=False)
    _last_batch: int = field(default=-1, init=False)

    def __post_init__(self):
        names = [m.name for m in self.metrics]
        if len(set(names)) != len(names) or not names:
            raise ValueError(f"metric names must be unique and non-empty: {names}")
        # Resume from an existing snapshot directory (restart survival).
        meta = self._meta_path()
        if os.path.exists(meta):
            with open(meta) as f:
                m = json.load(f)
            self._version = m["version"]
            self._last_batch = m["last_batch"]
            self._publish(self._state_path(self._version))

    def _root(self) -> str:
        if self.snapshot_dir is None:
            self.snapshot_dir = tempfile.mkdtemp(prefix=f"matview_{self.name}_")
        return self.snapshot_dir

    def _meta_path(self) -> str:
        return os.path.join(self._root(), "_meta.json")

    def _state_path(self, version: int) -> str:
        return os.path.join(self._root(), f"v{version:010d}")

    def _publish(self, path: str) -> None:
        state = self.spark.read.parquet(path)
        state.createOrReplaceTempView(f"{self.name}__state")
        state.select(
            *self.key_cols, *[m.final() for m in self.metrics]
        ).createOrReplaceTempView(self.name)

    def state(self) -> DataFrame:
        return self.spark.table(f"{self.name}__state")

    def view(self) -> DataFrame:
        return self.spark.table(self.name)

    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_batch:
            return  # redelivered batch: already folded in (exactly-once)
        partial = batch.groupBy(*self.key_cols).agg(
            *[m.partial() for m in self.metrics]
        )
        if self._version > 0:
            merged = (
                self.state()
                .unionByName(partial)
                .groupBy(*self.key_cols)
                .agg(*[m.merge() for m in self.metrics])
            )
        else:
            merged = partial
        version = self._version + 1
        path = self._state_path(version)
        merged.write.mode("overwrite").parquet(path)
        self._publish(path)
        self._version = version
        self._last_batch = batch_id
        # Atomic metadata publish: write-then-rename so a crash mid-write
        # can never leave truncated JSON — restart either sees the old
        # (version, last_batch) and refolds the batch idempotently, or
        # the new one and skips it; never a corrupt file that would turn
        # the documented restart-survival into a hard failure.
        meta = self._meta_path()
        tmp = meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "last_batch": batch_id}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, meta)
        self._gc()

    def foreach_batch(self, batch: DataFrame, batch_id: int) -> None:
        self.apply_batch(batch, batch_id)

    def _gc(self) -> None:
        keep = {
            f"v{self._version - i:010d}" for i in range(max(2, self.keep_versions))
        }
        root = self._root()
        for n in os.listdir(root):
            if n.startswith("v") and n not in keep:
                shutil.rmtree(os.path.join(root, n), ignore_errors=True)


def _versions(root: str) -> list[int]:
    import re

    out = []
    for n in os.listdir(root):
        m = re.fullmatch(r"v(\d{10})", n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


# Module-level methods attached to AggMatView below (kept out of the
# dataclass body so field ordering stays stable).
def view_at(self: AggMatView, version: int) -> DataFrame:
    """Read a RETAINED snapshot version (finalized form) — the
    debugging/diff surface for "what did the summary say before this
    batch". Only the last `keep_versions` versions exist (GC'd like
    the dimension snapshots); requesting an older one raises with the
    available range."""
    avail = _versions(self._root())
    if version not in avail:
        raise ValueError(
            f"version {version} not retained (available: {avail}; "
            f"keep_versions={self.keep_versions})"
        )
    state = self.spark.read.parquet(self._state_path(version))
    return state.select(*self.key_cols, *[m.final() for m in self.metrics])


def versions(self: AggMatView) -> list[int]:
    return _versions(self._root())


AggMatView.view_at = view_at
AggMatView.versions = versions
