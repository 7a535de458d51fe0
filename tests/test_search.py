"""BM25 ranked retrieval (functions/search.py) — python-twin pins."""

import math

from pink_spider_spark.functions import search as SE


def _bm25_py(docs, terms, k1=1.2, b=0.75):
    """Python twin replaying bm25_topk's exact arithmetic (including the
    1e-6 integerization before the per-doc sum)."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = float(sum(len(t) for t in toks.values())) / float(n)
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    out = {}
    for d, tk in toks.items():
        micro, hit = 0, 0
        for t in terms:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            hit += 1
            idf = math.log(((float(n) - float(df[t])) + 0.5)
                           / (float(df[t]) + 0.5) + 1.0)
            norm = (1.0 - b) + b * (float(len(tk)) / avgdl)
            ts = idf * ((float(tf) * (k1 + 1.0)) / (float(tf) + k1 * norm))
            micro += int(round(ts * 1e6))
        if hit:
            out[d] = (hit, round(float(micro) / 1e6, 4))
    return out


def test_bm25_matches_python_twin(spark):
    docs = [
        (0, "spark join spark window table"),
        (1, "merge sort merge merge stream line"),
        (2, "table scan row value key agg"),
        (3, "spark stream merge window spark stream"),
        (4, "window"),
    ]
    terms = ["spark", "stream", "merge", "window"]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: (r.n_terms_hit, r.score)
           for r in SE.bm25_topk(df, terms).collect()}
    assert got == _bm25_py(docs, terms)
    assert 2 not in got  # no query term -> absent, not zero-scored


def test_bm25_ranking_and_topk(spark):
    # doc 3 hits all four terms -> must outrank the single-term docs;
    # top_k truncates after the deterministic (score desc, id asc) order
    docs = [(i, "spark filler filler") for i in range(10)]
    docs.append((99, "spark stream merge window"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = SE.bm25_topk(df, ["spark", "stream", "merge", "window"],
                        top_k=3).collect()
    assert len(rows) == 3
    assert rows[0].doc_id == 99
    # identical filler docs tie -> doc_id ascending breaks the tie
    assert [r.doc_id for r in rows[1:]] == [0, 1]


def test_bm25_tf_saturation(spark):
    # BM25's tf term saturates: 10 repeats must score higher than 1 but
    # far less than 10x (the property that distinguishes it from raw tf)
    docs = [(0, "spark " + "pad " * 9), (1, ("spark " * 10) + "pad " * 0)]
    df = spark.createDataFrame([(d, t.strip()) for d, t in docs],
                               ["doc_id", "text"])
    got = {r.doc_id: r.score for r in SE.bm25_topk(df, ["spark"]).collect()}
    assert got[1] > got[0]
    assert got[1] < 5 * got[0]


# --------------------------------------------------------- phrase search
def test_phrase_search_counts_and_positions(spark):
    from pink_spider_spark.functions.search import phrase_search
    docs = [
        (0, "a b c x a b c"),        # two matches, first at 0
        (1, "a b x b c"),            # terms present, never consecutive
        (2, "A B C"),                # case-insensitive match at 0
        (3, "c b a"),                # reversed: no match
        (4, "a a b c"),              # match at 1
    ]
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in
           phrase_search(spark.createDataFrame(docs, ["doc_id", "text"]),
                         ["a", "b", "c"]).collect()}
    assert got == {0: (2, 0), 2: (1, 0), 4: (1, 1)}


def test_phrase_search_overlapping_and_repeated_token_phrase(spark):
    from pink_spider_spark.functions.search import phrase_search
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in
           phrase_search(
               spark.createDataFrame([(0, "x x x x")], ["doc_id", "text"]),
               ["x", "x"]).collect()}
    assert got == {0: (3, 0)}  # overlapping occurrences all count


def test_phrase_search_requires_two_tokens(spark):
    import pytest
    from pink_spider_spark.functions.search import phrase_search
    with pytest.raises(ValueError):
        phrase_search(None, ["solo"])


# ------------------------------------------------ reciprocal rank fusion
def test_rrf_fuse_hand_computed(spark):
    from pink_spider_spark.functions.search import rrf_fuse
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    got = {r["doc_id"]: (r["rank_0"], r["rank_1"], r["rrf"]) for r in
           rrf_fuse([a, b], top_k=10).collect()}
    assert got[3] == (3, 1, 1.0 / 63 + 1.0 / 61)   # in both lists
    assert got[1] == (1, None, 1.0 / 61)           # bm25-only
    assert got[4] == (None, 2, 1.0 / 62)           # knn-only
    # doc 3 (two lists) outranks every single-list doc
    order = [r["doc_id"] for r in sorted(
        rrf_fuse([a, b], top_k=10).collect(),
        key=lambda r: (-r["rrf"], r["doc_id"]))]
    assert order[0] == 3


def test_rrf_symmetric_rank_tie_breaks_on_id(spark):
    from pink_spider_spark.functions.search import rrf_fuse
    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (1, 2)], ["doc_id", "rank"])
    rows = rrf_fuse([a, b], top_k=2).collect()
    assert rows[0]["rrf"] == rows[1]["rrf"]        # symmetric swap ties
    assert [r["doc_id"] for r in rows] == [1, 2]   # id breaks it


def test_rrf_requires_lists():
    import pytest
    from pink_spider_spark.functions.search import rrf_fuse
    with pytest.raises(ValueError):
        rrf_fuse([])


# --------------------------------------------- Elias gamma posting bits
def test_gamma_bits_hand_postings(spark):
    # term 'x' in docs 0,1,3,7: gaps (vs -1 sentinel) 1,1,2,4 ->
    # bitlens 1,1,2,3 -> gamma bits 1+1+3+5 = 10; df=4
    rows = [(0, "x"), (1, "x"), (3, "x"), (7, "x"), (2, "solo")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from pink_spider_spark.functions.search import posting_gamma_bits
    out = {r.term: r for r in
           posting_gamma_bits(df, min_df=1).collect()}
    x = out["x"]
    assert (x.df, x.gamma_bits) == (4, 10)
    assert x.bits_per_posting == 2.5
    assert x.ratio_vs_64bit == round(10 / 256, 4)
    # dense postings (every doc) compress best: all gaps 1 -> 1 bit
    dense = spark.createDataFrame(
        [(i, "t") for i in range(8)], ["doc_id", "text"])
    (t,) = posting_gamma_bits(dense, min_df=1).collect()
    assert t.gamma_bits == 8 and t.bits_per_posting == 1.0
