"""Minimum-parallelism guard for compute-amplifying operators.

Several operators multiply per-row work by orders of magnitude before
the first shuffle — rolling window hashes (×n_tokens), n-gram explosion
(×n_grams), per-vector numpy signature passes.  When such an operator
is fed by a scan with FEWER partitions than the session's parallelism
(a single small parquet file yields ONE partition — one core does all
the amplified work), the stage serializes no matter how many executor
slots exist.  AQE cannot repair this: it only re-splits post-shuffle
stages, never the scan-side stage itself.

``fan_out`` inserts one narrow round-robin repartition of the SMALL
pre-amplification input, and ONLY when the incoming partition count is
below the session parallelism.  At scale the condition is false — a
100 TB table arrives as tens of thousands of scan partitions — so no
shuffle is ever added to the plans that matter; locally (and on any
cluster reading a handful of small files) it buys the full slot count
for the amplified stage at the cost of shuffling the un-amplified
input once.

Values are unaffected (a repartition moves rows, never rewrites them);
callers whose aggregation semantics are accumulation-ORDER-sensitive
(floating-point avg/sum pinned to a rounding contract) must verify the
cross-engine oracle still matches before adopting it — integer/min/max
/count aggregations are order-free and always safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's parallelism iff it currently
    has fewer partitions; otherwise return it untouched (no-op at
    scale).  ``min_parts`` overrides the target for callers that know
    their amplification factor."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
