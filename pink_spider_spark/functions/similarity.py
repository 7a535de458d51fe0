"""Embedding similarity search: brute-force cosine top-k + LSH bucketing.

Baseline path: exact cosine via ``zip_with``/``aggregate`` (JVM-side fold,
no Python).  Scale path: random-hyperplane LSH buckets (deterministic
md5-derived plane components so the DuckDB oracle reproduces bucket ids
exactly) restrict candidate sets to one bucket before the exact rerank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import h60

DIM = 64  # driver embeddings table dimension


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold in double precision."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a.cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_brute_force(df: DataFrame, query_vec: list, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    decimals: int = 4) -> DataFrame:
    """Exact top-k cosine neighbors of a literal query vector.

    Plan shape: single scan + per-row fold + global top-k (takeOrdered via
    sort+limit, no full shuffle thanks to limit pushdown into the sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(id_col, F.round(cosine(F.col(vec_col), q), decimals).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    (h60('plane-p-d') % 2000000) / 1e6 - 1.  Same closed form is inlined
    into the oracle SQL."""
    # local import keeps this usable without Spark for test vectors
    import hashlib
    h = int(hashlib.md5(f"plane-{p}-{d}".encode()).hexdigest()[:15], 16)
    return (h % 2000000) / 1e6 - 1.0


def lsh_bucket(df: DataFrame, n_planes: int = 8, vec_col: str = "embedding",
               id_col: str = "vec_id", dim: int = DIM) -> DataFrame:
    """Random-hyperplane LSH: bucket = Σ_p (dot(v, plane_p) >= 0) << p."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(plane_component(p, d)) for d in range(dim)])
        bit = F.when(dot(F.col(vec_col), plane) >= 0,
                     F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return df.select(id_col, bucket.alias("bucket"))


def ann_topk(df: DataFrame, query_vec: list, k: int = 10,
             n_planes: int = 8, vec_col: str = "embedding",
             id_col: str = "vec_id", dim: int = DIM) -> DataFrame:
    """LSH-bucketed ANN: rerank only vectors sharing the query's bucket.
    (Recall < 1 by construction; the scale path for 10^9+ rows.)"""
    import hashlib  # noqa: F401  (plane_component)
    qbucket = 0
    for p in range(n_planes):
        plane = [plane_component(p, d) for d in range(dim)]
        if sum(a * b for a, b in zip([float(x) for x in query_vec], plane)) >= 0:
            qbucket += 1 << p
    bucketed = lsh_bucket(df, n_planes, vec_col, id_col, dim)
    cands = df.join(bucketed.filter(F.col("bucket") == qbucket).select(id_col), id_col)
    return knn_brute_force(cands, query_vec, k, vec_col, id_col)


def label_centroids(df: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label", dim: int = DIM,
                    decimals: int = 4) -> DataFrame:
    """Per-label centroid, long format (label, dim_pos, value).
    ``+ 0.0`` canonicalizes IEEE -0.0 (a centroid of values averaging to
    a tiny negative can round to -0.0 on one engine and 0.0 on another;
    they compare equal but serialize differently)."""
    return (
        df.select(label_col, F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("dim_pos", "v"))
        .groupBy(label_col, "dim_pos")
        .agg((F.round(F.avg("v"), decimals) + F.lit(0.0)).alias("centroid"))
    )


def near_dup_pairs_lsh(df: DataFrame, threshold: float = 0.3,
                       n_planes: int = 8, vec_col: str = "embedding",
                       id_col: str = "vec_id", dim: int = DIM,
                       decimals: int = 4) -> DataFrame:
    """Embedding near-dup pairs via LSH-bucketed candidates + exact rerank.

    The scale path for the near-dup family: candidate pairs come from an
    EQUI-join on the hyperplane bucket (shuffle keyed on small buckets,
    never O(n^2)); the exact cosine runs only on bucket-mates.  One
    bucket per vector means no duplicate pairs, so the expected pair set
    is closed-form for the DuckDB oracle.  Recall < 1 by construction
    (cross-bucket near-dups are missed); the exact all-pairs form
    (queries.emb_near_dup_pairs) remains the small-scale verifier.
    """
    withb = df.join(lsh_bucket(df, n_planes, vec_col, id_col, dim), id_col)
    a = withb.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("ea"), "bucket")
    b = withb.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim_raw", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("sim_raw") >= threshold)
        .select("id_a", "id_b", F.round("sim_raw", decimals).alias("sim"))
    )
