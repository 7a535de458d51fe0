"""Ranked keyword retrieval: BM25 scoring without an inverted index.

Okapi BM25 (Robertson & Walker 1994; the Lucene-default +1 idf variant)
as a single declarative pass — the shape a 100 TB corpus wants when a
handful of ad-hoc queries don't justify building and maintaining an
index: the token explode is filtered to the query's terms IMMEDIATELY
(Catalyst pushes the isin through the generator's consumer, so only
query-term postings survive into the shuffle), document frequencies and
corpus stats are broadcast-sized by construction (|query| rows and one
scalar row), document length joins on the doc key, and the final top-k
is a TakeOrderedAndProject — never a global sort.

Cross-engine determinism: per-(doc, term) scores are doubles built from
a pinned expression shape (one ln, fixed association order), then
integerized to 1e-6 resolution BEFORE the per-doc sum — integer sums
are order-free under any partitioning, so Spark and the SQL oracle
produce identical ranked lists including tie-breaks (score desc,
doc_id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as X
from .fanout import fan_out


def bm25_topk(df: DataFrame, query_terms: list, text_col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
              top_k: int = 20) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.  Returns
    (doc_id, n_terms_hit, score) — documents matching no query term are
    absent (their score is 0).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))
    with idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1): the non-negative
    Lucene formulation."""
    base = fan_out(df).select(F.col(id_col).alias("doc_id"),
                              X.tokens(F.col(text_col)).alias("tk"))
    lens = base.select("doc_id", F.size("tk").cast("long").alias("dl"))
    stats = lens.agg(F.count("*").cast("long").alias("n_docs"),
                     F.sum("dl").alias("sum_dl"))
    # postings for query terms only — the isin prunes the exploded
    # stream before any shuffle; (doc, term) counts are the tf table
    tf = (base.select("doc_id", F.explode("tk").alias("term"))
          .filter(F.col("term").isin(list(query_terms)))
          .groupBy("doc_id", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    n_d = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_d
    idf = F.log(((n_d - F.col("df").cast("double")) + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5)) + F.lit(1.0))
    norm = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    denom = F.col("tf").cast("double") + F.lit(k1) * norm
    ts = idf * ((F.col("tf").cast("double") * F.lit(k1 + 1.0)) / denom)

    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(lens, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("doc_id",
                      F.round(ts * F.lit(1e6)).cast("long").alias("micro")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_terms_hit"),
                 F.sum("micro").alias("sm"))
            .select("doc_id", "n_terms_hit",
                    F.round(F.col("sm").cast("double") / F.lit(1e6), 4)
                    .alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(top_k))


def phrase_search(df: DataFrame, phrase: list, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact phrase search over a positional index (the operator a
    ranked-retrieval stack runs beside BM25 — Manning, Raghavan &
    Schütze, IIR §2.4 positional postings): documents containing the
    query tokens at CONSECUTIVE positions, with match count and first
    match position per document.

    Scale shape: the positional postings explode is pruned to the
    phrase's terms BEFORE any shuffle (an IN filter the scan can push),
    then the phrase intersects via (doc, position)-keyed equi-joins —
    term i of the phrase must sit at pos + i — which is exactly the
    positional-index intersection of a search engine, never a string
    scan over full documents.  All integer; one final doc-keyed agg.
    Returns (doc_id, n_matches, first_pos)."""
    if len(phrase) < 2:
        raise ValueError("phrase needs at least two tokens")
    phrase = [t.lower() for t in phrase]
    tk = X.tokens(F.lower(F.col(text_col)))
    post = (fan_out(df.select(id_col, text_col))
            .select(F.col(id_col), F.posexplode(tk).alias("pos", "w"))
            .where(F.col("w").isin(*set(phrase)))
            .localCheckpoint(eager=False))
    cur = (post.where(F.col("w") == phrase[0])
           .select(id_col, F.col("pos").alias("p0")))
    for i, term in enumerate(phrase[1:], start=1):
        nxt = (post.where(F.col("w") == term)
               .select(F.col(id_col),
                       (F.col("pos") - i).alias("p0")))
        cur = cur.join(nxt, [id_col, "p0"])
    return (cur.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.min("p0").cast("long").alias("first_pos")))


def rrf_fuse(ranked_lists: list, id_col: str = "doc_id", c: int = 60,
             top_k: int = 10) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher SIGIR 2009,
    "Reciprocal rank fusion outperforms Condorcet and individual rank
    learning methods"): fuse N ranked lists by
    RRF(d) = Σ_lists 1/(c + rank_i(d)), the standard hybrid-retrieval
    combiner (BM25 list + embedding-kNN list).  Documents absent from a
    list contribute 0 for it.

    Each input frame carries (id_col, ``rank``) with rank 1-based.
    Determinism: ranks are exact integers, each 1/(c+rank) is one IEEE
    division, and the sum is a FIXED-ARITY left-to-right expression in
    list order — identical doubles cross-engine, no rounding (rounding
    is what breaks: see jl_project).  Ties (symmetric rank swaps give
    equal sums) break on the id.

    Scale shape: the lists are top-k results — bounded by construction —
    so fusion is a chain of outer joins over tiny frames followed by a
    global top-k; cost lives in the upstream rankers."""
    if not ranked_lists:
        raise ValueError("need at least one ranked list")
    out = None
    for i, df in enumerate(ranked_lists):
        cur = df.select(F.col(id_col),
                        F.col("rank").alias(f"rank_{i}"))
        out = cur if out is None else out.join(cur, id_col, "full_outer")
    expr = None
    for i in range(len(ranked_lists)):
        term = F.coalesce(F.lit(1.0) / (F.lit(float(c))
                                        + F.col(f"rank_{i}")),
                          F.lit(0.0))
        expr = term if expr is None else expr + term
    return (out.withColumn("rrf", expr)
            .orderBy(F.desc("rrf"), F.asc(id_col))
            .limit(top_k))


def posting_gamma_bits(df, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_df: int = 2):
    """Inverted-index compression planning with Elias γ-codes (Elias,
    IEEE IT 1975; the gap-compression analysis of Witten, Moffat &
    Bell, "Managing Gigabytes") — the storage estimate an index build
    runs before choosing a posting-list codec: docs per term sorted by
    id, delta-encoded into gaps, each gap g costing the γ-code's exact
    2·⌊log₂g⌋+1 bits.  Frequent terms have dense postings → small gaps
    → few bits/posting; the long tail stays near the raw cost.  At
    100 TB this table IS the index sizing model.

    Exactness contract: ⌊log₂g⌋+1 is the BIT LENGTH of g, computed as
    ``length(bin(g))`` — an integer string op in both engines, never
    floating log₂ (log2(8)=2.999… libm hazard).  Gaps, bit sums and
    the raw 64-bit baseline are exact longs; the single division is
    the 4-dp bits/posting and compression ratio.

    Scale shape: one (term, doc) distinct projection, a per-term
    ordered LAG window (posting-list sized partitions — the inverted
    index itself), one term-keyed agg.

    Returns (term, df, gamma_bits, bits_per_posting, ratio_vs_64bit)
    for terms with df ≥ ``min_df``."""
    from pyspark.sql import Window as W_

    from .text import tokens

    posting = (df.select(F.col(id_col).alias("d"), F.explode(
        tokens(F.lower(F.col(text_col)))).alias("t"))
        .distinct())
    w = W_.partitionBy("t").orderBy("d")
    gaps = posting.select(
        "t",
        (F.col("d") - F.coalesce(F.lag("d").over(w), F.lit(-1)))
        .alias("g"))
    bits = (F.lit(2) * F.length(F.bin(F.col("g"))) - F.lit(1)) \
        .cast("long")
    return (gaps.groupBy("t")
            .agg(F.count("*").cast("long").alias("df_"),
                 F.sum(bits).alias("gamma_bits"))
            .where(F.col("df_") >= min_df)
            .select(F.col("t").alias("term"),
                    F.col("df_").alias("df"), "gamma_bits",
                    F.round(F.col("gamma_bits")
                            / F.col("df_").cast("double"), 4)
                    .alias("bits_per_posting"),
                    F.round(F.col("gamma_bits")
                            / (F.lit(64) * F.col("df_")).cast("double"),
                            4).alias("ratio_vs_64bit")))
