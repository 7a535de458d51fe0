"""Measured corpus-level recall@10 for the approximate ANN paths (IVF and
multi-probe hyperplane LSH) against exact brute-force cosine over the
driver's sf0.01 embeddings table (500 x 64 float32, 24 query vectors).

The banded-LSH near-dup path has had a measured-recall assertion since
round 2 (test_banded_lsh_recall_vs_exact); these close the same gap for
the two query-time ANN operators, whose earlier units pinned only
single-vector probe mechanics.  The fit and the planes are fully
deterministic, so the measured recalls are exact constants on this
corpus; floors sit ~0.05 under them so genuine regressions trip while
refactoring jitter does not.  Monotonicity (more probes => recall never
drops) is asserted exactly, per query where structurally guaranteed.

Absolute recalls here are modest: the synthetic 64-dim embeddings are
near-uniform in direction (weak cluster structure), the adversarial
case for space-partitioning ANN.  What these tests pin is the
recall/cost mechanics — each probe-widening step buys the measured
recall increment at the documented candidate-set cost (numbers recorded
in COVERAGE.md).
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/embeddings.parquet"),
    reason="driver testdata not present")

K = 10
N_QUERIES = 24


def _queries(spark):
    """24 corpus vectors spread across the id range (every 21st)."""
    rows = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .filter("vec_id % 21 = 0").orderBy("vec_id")
            .limit(N_QUERIES).collect())
    return [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()
    qs = _queries(spark)
    assert len(qs) == N_QUERIES
    yield emb, qs
    emb.unpersist()


def _exact_top(emb, qvec):
    from pink_spider_spark.functions.similarity import knn_brute_force

    return {r.vec_id for r in knn_brute_force(emb, qvec, k=K).collect()}


def _recall(got: set, truth: set) -> float:
    return len(got & truth) / len(truth)


def test_ivf_corpus_recall_by_nprobe(spark, corpus):
    from pink_spider_spark.functions.clustering import ann_ivf, kmeans_fit

    emb, qs = corpus
    # index build ONCE (the at-scale shape), pinned with localCheckpoint
    # so 24 queries don't re-run the fit lineage
    assigned, cents = kmeans_fit(emb, k=8, iters=2)
    index = (assigned.localCheckpoint(eager=True),
             cents.localCheckpoint(eager=True))
    recalls = {}
    for nprobe in (2, 4):
        per_q = []
        for _qid, qvec in qs:
            truth = _exact_top(emb, qvec)
            got = {r.vec_id for r in
                   ann_ivf(emb, qvec, topk=K, k=8, nprobe=nprobe,
                           index=index).collect()}
            per_q.append(_recall(got, truth))
        recalls[nprobe] = sum(per_q) / len(per_q)
    # more probed clusters can only widen the candidate set per query
    assert recalls[4] >= recalls[2]
    # measured (deterministic fit): nprobe=2 = 0.508, nprobe=4 = 0.758 —
    # i.e. probing 2 of 8 clusters (25% of the corpus) recovers half the
    # exact top-10, doubling the probes buys +0.25 recall
    assert recalls[2] >= 0.45, recalls
    assert recalls[4] >= 0.70, recalls


def test_multiprobe_corpus_recall_vs_single_probe(spark, corpus):
    from pink_spider_spark.functions.similarity import (ann_topk,
                                                        ann_topk_multiprobe)

    emb, qs = corpus
    # density-appropriate planes for a 500-vector corpus: 4 planes = 16
    # buckets (~31 vectors each).  The default 8 planes (256 buckets)
    # leaves ~2 vectors per bucket — recall@10 is then structurally
    # capped near 0.2 regardless of algorithm quality, which would
    # measure corpus sparsity, not the operator.
    n_planes = 4
    single, multi = [], []
    for _qid, qvec in qs:
        truth = _exact_top(emb, qvec)
        s = {r.vec_id for r in
             ann_topk(emb, qvec, k=K, n_planes=n_planes).collect()}
        m = {r.vec_id for r in
             ann_topk_multiprobe(emb, qvec, k=K, n_planes=n_planes).collect()}
        # probe set is a superset of the single bucket -> per-query
        # candidates (and thus recall) can never shrink
        assert _recall(m, truth) >= _recall(s, truth)
        single.append(_recall(s, truth))
        multi.append(_recall(m, truth))
    avg_s, avg_m = sum(single) / len(single), sum(multi) / len(multi)
    assert avg_m >= avg_s
    # measured (deterministic planes): single = 0.183, radius-1
    # multiprobe = 0.525 — probing the 4 Hamming-1 buckets too (5/16 of
    # the corpus) nearly triples recall, the Lv et al. trade the
    # operator exists for
    assert avg_m >= 0.45, (avg_s, avg_m)
    assert avg_m - avg_s >= 0.25, (avg_s, avg_m)
