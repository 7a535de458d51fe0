"""Deterministic distinct-count sketches.

KMV (k-minimum-values / bottom-k) cardinality estimation: keep the k
smallest values of a uniform hash of the keys; the k-th smallest,
normalized to [0,1), estimates density, so distinct ≈ (k-1)/norm(kth).
Unlike HyperLogLog (whose register layout is engine-specific), KMV is a
pure function of the hash — so Spark and the DuckDB oracle produce
BIT-IDENTICAL sketches and estimates, which is why it is the engine's
verifiable sketch primitive (same spirit as the theta sketch family).

Scale shape: the hash is the shared cross-engine h60 (md5-derived, in
text.py).  The min-k aggregation is two-phase salted — k smallest per
(group, salt) partition-bounded window, then k smallest of the ≤
salt·k survivors per group — the same skew-immune dequeue pattern as
the crawl scheduler's per-host budget; no group ever sorts its full
distinct set on one task.  Memory per group is O(k), merge is
union+re-min — the sketch is distributive, so map-side partials work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text as X

H_SPACE = float(1 << 60)  # h60 values are uniform in [0, 2^60)


def kmv_distinct(df: DataFrame, key_cols: list, value_col: str,
                 k: int = 64, salts: int = 16) -> DataFrame:
    """Per-group KMV distinct estimate of ``value_col``.  Returns
    (group..., exact_distinct, kmv_estimate); groups with fewer than k
    distinct values report the exact count (the sketch is exact below
    k by construction)."""
    hashed = (df.select(*key_cols,
                        X.h60(F.col(value_col).cast("string")).alias("hv"))
              .distinct())
    salted = hashed.withColumn("__s", F.pmod(F.col("hv"), F.lit(salts)))
    w1 = Window.partitionBy(*key_cols, "__s").orderBy("hv")
    survivors = (salted.withColumn("__r", F.row_number().over(w1))
                 .filter(F.col("__r") <= k).drop("__r", "__s"))
    w2 = Window.partitionBy(*key_cols).orderBy("hv")
    topk = (survivors.withColumn("__r", F.row_number().over(w2))
            .filter(F.col("__r") <= k))
    agg = (topk.groupBy(*key_cols)
           .agg(F.count("*").alias("m"), F.max("hv").alias("kth")))
    # m < k means the group's full distinct set fit in the sketch.
    exact = hashed.groupBy(*key_cols).agg(F.count("*").alias("nd"))
    est = F.when(F.col("m") < k, F.col("nd").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * (F.lit(H_SPACE) / F.col("kth")), 4))
    return (agg.join(exact, list(key_cols))
            .select(*key_cols, F.col("nd").cast("long")
                    .alias("exact_distinct"), est.alias("kmv_estimate")))


# -------------------------------------------------- count-min sketch
def _cms_col(key_col: str, row_col) -> F.Column:
    """Row-i hash column: h60('cms-<i>-<key>'), the % width applied by
    the caller (kept separate so the string recipe is trivially
    mirrored in SQL)."""
    return X.h60(F.concat(F.lit("cms-"), row_col.cast("string"),
                          F.lit("-"), F.col(key_col).cast("string")))


def cms_counters(df: DataFrame, key_col: str, depth: int = 4,
                 width: int = 1024) -> DataFrame:
    """Count-Min sketch counter table (Cormode & Muthukrishnan 2005):
    ``depth`` independent hash rows of ``width`` counters; every
    occurrence of a key increments cell (i, hᵢ(key) mod width).
    Returns (row, col, c) — at most depth·width rows regardless of
    input size, built by ONE linear (row, col)-keyed aggregation with
    map-side combine.  The sketch is distributive (counters add), so
    partial sketches from any partitioning merge by summation — the
    property that makes CMS the at-scale substitute for an exact
    per-key count when only heavy hitters matter.

    Determinism: the row hashes are the shared cross-engine h60 over
    the string 'cms-<row>-<key>', so Spark and the SQL oracle build
    the IDENTICAL counter table."""
    rows = df.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"))
    return (rows.select("row",
                        (_cms_col(key_col, F.col("row")) % width)
                        .alias("col"))
            .groupBy("row", "col")
            .agg(F.count("*").cast("long").alias("c")))


def cms_estimate(counters: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows of the key's
    counter — always ≥ the true count (one-sided error ≤ e·N/width with
    probability 1−e^−depth).  The probe joins depth rows per key
    against the broadcast-sized counter table."""
    probes = (keys.select(F.col(key_col))
              .distinct()
              .select(key_col,
                      F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
                      .alias("row")))
    probes = probes.withColumn(
        "col", _cms_col(key_col, F.col("row")) % width)
    # LEFT join + coalesce(0): the counter table is sparse (cells never
    # touched by the stream have no row), so a probed key absent from the
    # stream must read its empty cells as 0 and report cms_est = 0 — an
    # inner join would either drop the key or min() over only its
    # colliding cells, overestimating.
    return (probes.join(F.broadcast(counters), ["row", "col"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long")))
                 .alias("cms_est")))
