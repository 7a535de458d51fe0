"""Physical-plan audit: verify the plans are the ones we designed.

For each audited query: print the formatted plan and assert structural
expectations (filter/column pushdown into the parquet scan, broadcast
joins on dimension sides, no cartesian products, whole-stage codegen
present).  Run: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = {
    # query -> (must contain, must NOT contain)
    "part_search_red": (["PushedFilters"], ["CartesianProduct"]),
    # exact substring dedup: groupBy-min on window hash + keyed joins —
    # never a sort-window over the (hot) fingerprint key, no cartesian
    "docs_substring_dedup": ([], ["CartesianProduct", "Window"]),
    # multi-probe ANN: literal IN over in-row buckets + global top-k
    "emb_ann_topk_multiprobe_of_vec0": (["TakeOrderedAndProject"],
                                        ["CartesianProduct", "Window"]),
    "orders_mget": (["PushedFilters: [In(o_orderkey"], ["CartesianProduct"]),
    "active_suppliers": (["GreaterThan(s_acctbal"], []),
    "nation_customer_rollup": (["BroadcastHashJoin"], ["SortMergeJoin", "CartesianProduct"]),
    "revenue_by_segment": (["BroadcastHashJoin"], ["CartesianProduct"]),
    "events_after_jan15": (["PushedFilters"], []),
    "latest_order_per_customer": (["Window"], ["CartesianProduct"]),
    "docs_token_count": (["ReadSchema: struct<doc_id:bigint,text:string>"], []),
    "emb_knn_of_vec0": (["ReadSchema: struct<vec_id:bigint,embedding:array<float>>"],
                        ["CartesianProduct"]),
    # keyset pagination: cursor predicate pushed to the scan, page fetched
    # as a distributed top-k — NO global row_number window
    "events_page_after": (["PushedFilters", "TakeOrderedAndProject"],
                          ["Window", "CartesianProduct"]),
    # LSH-bucketed near-dup: candidates from an equi-join (hash join on
    # bucket), never a nested-loop/cartesian pairing
    "emb_near_dup_pairs_lsh": ([], ["BroadcastNestedLoopJoin",
                                    "CartesianProduct"]),
    # gopher signals are pure in-row expressions: the plan must be a
    # narrow projection over the pruned scan — no shuffle, no window
    "docs_gopher_quality": (["ReadSchema: struct<doc_id:bigint,text:string>"],
                            ["Exchange", "Window", "CartesianProduct"]),
    # corpus line dedup: keyed hash aggregations (map-side combine),
    # never a window sort over the hot line partition
    "docs_line_dedup": (["HashAggregate"], ["Window", "CartesianProduct"]),
    "emb_int8_quantize": (
        ["ReadSchema: struct<vec_id:bigint,embedding:array<float>>"],
        ["Exchange", "CartesianProduct"]),
    "docs_pii_scrub": (["ReadSchema: struct<doc_id:bigint,text:string>"],
                       ["Exchange", "CartesianProduct"]),
    # decontamination: bench gram set joins broadcast-hash; the corpus
    # side never sort-merges on the gram key
    "docs_decontaminate": (["BroadcastHashJoin"],
                           ["SortMergeJoin", "BroadcastNestedLoopJoin",
                            "CartesianProduct"]),
    # unigram LM: vocab and total both come back broadcast — no
    # sort-merge anywhere; doc/token hash aggregations only
    "docs_unigram_logprob": (["BroadcastHashJoin", "HashAggregate"],
                             ["SortMergeJoin", "CartesianProduct"]),
    # stratified sample: in-row hash predicate, no shuffle at all
    "docs_stratified_sample": ([], ["Exchange", "Window",
                                    "CartesianProduct"]),
    # as-of join: one union + keyed window — never a range/nested-loop
    "events_asof_last_signup": (["Window"],
                                ["BroadcastNestedLoopJoin",
                                 "CartesianProduct", "SortMergeJoin"]),
    # bucketed range join: plain hash equi-join on the bucket key
    "signup_click_window_counts": ([], ["BroadcastNestedLoopJoin",
                                        "CartesianProduct"]),
    # rollup compiles to Expand + hash aggregate, dims broadcast
    "revenue_rollup": (["Expand", "BroadcastHashJoin"],
                       ["CartesianProduct"]),
    "events_weekday_pivot": (["HashAggregate"],
                             ["Exchange hashpartitioning(event_type",
                              "CartesianProduct"]),
    # banded LSH near-dup: all joins are keyed (band,bucket)/(vec_id)
    # hash joins over the thin signature table — no nested-loop pairing
    "emb_near_dup_pairs_lsh_banded": ([], ["BroadcastNestedLoopJoin",
                                           "CartesianProduct"]),
    # SemDedup: the dup pair space is an equi-join on the cluster key —
    # never an all-pairs cartesian; no window anywhere.  (The plan's one
    # BroadcastNestedLoopJoin is the deliberate k-row centroid broadcast
    # cross join inside kmeans_assign, bounded at k=8 rows.)
    "emb_semdedup": ([], ["CartesianProduct", "Window"]),
    # IVF ANN: probe choice and final answer are both global top-k
    # (TakeOrderedAndProject), candidates restricted via broadcast probe
    # join — no window, no all-pairs
    "emb_ann_ivf_of_vec0": (["TakeOrderedAndProject"],
                            ["CartesianProduct", "Window"]),
    # approx quantiles: one hash-partitioned aggregation of mergeable GK
    # sketches (the 100 TB form) — no sort, no window
    "events_value_quantiles_approx": (["HashAggregate"],
                                      ["Sort", "Window",
                                       "CartesianProduct"]),
    # CCNet terciles: linear aggs + a broadcast |langs|-row cut table —
    # no global sort/window, no cartesian.  (The single-row totals
    # broadcast rides a bounded BroadcastNestedLoopJoin by design.)
    "docs_ccnet_buckets": ([], ["Window", "CartesianProduct"]),
    # DSIR: one bucket-keyed agg + broadcast λ table + doc-keyed agg
    "docs_dsir_weights": ([], ["Window", "CartesianProduct"]),
    # inverted-index similarity: term-keyed self-equi-join bounded by
    # the df cut — never an all-pairs document CartesianProduct, no
    # window.  (The one BroadcastNestedLoopJoin is the single-row
    # corpus-size broadcast riding the df cut, bounded at 1 row.)
    "docs_tfidf_cosine_pairs": ([], ["Window", "CartesianProduct"]),
    # URL triage: blocklist is a broadcast hash join; pure in-row
    # signals otherwise
    "frontier_url_filter": (["BroadcastHashJoin"],
                            ["Window", "CartesianProduct",
                             "SortMergeJoin"]),
    # freshness priority: one key-grouped linear agg over the revisit
    # log + one url-keyed equi-join onto the frontier — no window, no
    # cartesian, no nested loop
    "frontier_freshness_priority": ([], ["Window", "CartesianProduct",
                                         "BroadcastNestedLoopJoin"]),
    # Mann-Kendall: hourly keyed agg, grp-keyed pair join over the
    # span-bounded hourly series, keyed tie agg — no window, no
    # cartesian, no nested loop
    "events_mann_kendall": ([], ["Window", "CartesianProduct",
                                 "BroadcastNestedLoopJoin"]),
    # Gini: one keyed count agg + rank/sums over the per-entity table
    # (the one Window is the global rank over n_entities rows —
    # sublinear, documented in-line like the zipf/vocabulary cases)
    "events_load_gini": ([], ["CartesianProduct",
                              "BroadcastNestedLoopJoin"]),
    # Good-Turing: token agg -> vocabulary agg -> tiny N_r self-join;
    # the single-row total rides a bounded broadcast (the tfidf df-cut
    # precedent); no window, no cartesian
    "docs_good_turing": ([], ["Window", "CartesianProduct"]),
    # Kaplan-Meier: entity min/max agg + suffix/prefix windows over
    # the DISTINCT-lifetime table (sublinear, unpartitioned by design,
    # documented); no cartesian over data
    "events_kaplan_meier": (["Window"], ["CartesianProduct"]),
    # ACF: densified hourly series (span-bounded), keyed lag self-join
    # + keyed aggs; the lag list rides a bounded 6-row broadcast; no
    # window
    "events_hourly_acf": ([], ["Window", "CartesianProduct"]),
    # HLL overlap: register-keyed MAX aggs + bounded side/estimate
    # combines (1-3 rows each); the union side is a register-keyed agg
    # of the same sketch table; no cartesian over data
    "events_audience_overlap_hll": ([], ["CartesianProduct", "Window"]),
    # Markov: entity-partitioned LEAD window + keyed count aggs + a
    # type-cardinality marginal join; no cartesian, no nested loop
    "events_markov_transitions": (["Window"],
                                  ["CartesianProduct",
                                   "BroadcastNestedLoopJoin"]),
    # Kendall tau: node-keyed score join + node-pair self-join (the
    # deliberate u<v pairing over the POLICY table, quadratic in nodes
    # only) + bounded 1-row combine; no window
    "graph_rank_tau": ([], ["Window"]),
    # gamma bits: (term,doc) distinct + per-term ordered LAG window
    # (posting-list partitions) + term-keyed agg; no join, no cartesian
    "docs_posting_gamma_bits": (["Window"], ["Join", "CartesianProduct"]),
    # source KL: vocab-level keyed aggs + bounded 1-row total
    # broadcast; terms micro-integerized so the sum is order-free; no
    # window, no cartesian
    "docs_source_kl": ([], ["Window", "CartesianProduct"]),
    # association rules: distinct projection + user-keyed self-join
    # bounded by the tiny per-user itemset + bounded 1-row total; no
    # window, no cartesian
    "events_assoc_rules": ([], ["Window", "CartesianProduct"]),
    # A/B z-test: entity-keyed agg -> 2-row variant agg -> 1-row
    # combine; the cross join is the bounded 2x1-row combine, never a
    # data-sized pairing; no window
    "events_ab_ztest": ([], ["Window", "SortMergeJoin"]),
    # burstiness: two linear keyed aggs, vocabulary-sized output — no
    # join at all, no window, no cartesian
    "docs_term_burstiness": (["HashAggregate"],
                             ["Join", "Window", "CartesianProduct"]),
    # Dunning LLR: same shape as PMI — in-row bigrams, token-keyed
    # aggs, vocab-level marginal joins, 1-row broadcast total; no
    # window, no cartesian
    "docs_llr_collocations": ([], ["Window", "CartesianProduct"]),
    # reciprocity: distinct + reverse-edge semi-join + count aggs; the
    # three single-row counters combine via bounded 1-row broadcasts
    # (never a data-sized nested loop); no window
    "graph_reciprocity": ([], ["Window", "SortMergeJoin"]),
    # Flesch: pure in-row regexp counts over the pruned scan - no
    # shuffle at all, no join, no window
    "docs_flesch_reading": (
        ["ReadSchema: struct<doc_id:bigint,text:string>"],
        ["Exchange", "Join", "Window", "CartesianProduct"]),
    # trap triage: pure in-row parse_url/rlike expressions over the
    # generated frontier — no join at all, no shuffle beyond the range
    # source, no window
    "frontier_trap_filter": ([], ["Window", "CartesianProduct",
                                  "Exchange", "Join"]),
    # PQ: grouped Lloyd's — (vector,sub) rows vs broadcast m·k codebook
    # on the sub key, (sub,cid,pos)-keyed update; no window, no
    # cartesian (codebook ride-along is a bounded broadcast)
    "emb_pq_codes": ([], ["Window", "CartesianProduct"]),
    # ADC: broadcast m·k distance table joined on (sub,cid), per-vector
    # integer sum, global top-k — never touches the original vectors
    "emb_pq_adc_topk": (["TakeOrderedAndProject"],
                        ["Window", "CartesianProduct"]),
    # CMS: one (row,col)-keyed linear agg builds the bounded counter
    # table (broadcast back for the probe); no window, no cartesian
    "events_heavy_hitters_cms": (["BroadcastHashJoin"],
                                 ["Window", "CartesianProduct"]),
    # Zipf fit: the one DELIBERATE global window (over the vocabulary,
    # sublinear in corpus size) + exact decimal OLS sums — no cartesian
    "docs_zipf_stats": (["HashAggregate"], ["CartesianProduct"]),
    # HLL: (group,register)-keyed MAX + exact decimal harmonic sum —
    # two linear keyed aggs with map-side combine, nothing else
    "events_distinct_users_hll": (["HashAggregate"],
                                  ["Window", "CartesianProduct",
                                   "SortMergeJoin"]),
    # BM25: query-term filter pruned before the shuffle, broadcast
    # df/stats sides, global top-k — no index, no window, no cartesian
    "docs_bm25_topk": (["TakeOrderedAndProject", "BroadcastHashJoin"],
                       ["Window", "CartesianProduct"]),
    # recrawl priority: ONE key-grouped linear agg over the fetch log +
    # in-row ln/exp scoring — no window, no join, no cartesian
    "events_recrawl_priority": (["HashAggregate"],
                                ["Window", "CartesianProduct",
                                 "SortMergeJoin", "BroadcastHashJoin"]),
    # HITS: per-round keyed joins + linear integer aggs over the pinned
    # edge list; the visible top-level join (auth ⋈ hub on node) is a
    # keyed equi-join of two checkpointed node-sized frames (SMJ
    # statically, AQE re-plans at runtime) — no window, no cartesian,
    # no nested loop
    "graph_hits": ([], ["Window", "CartesianProduct",
                        "BroadcastNestedLoopJoin"]),
    # OPIC: per-round src-keyed join + dst-keyed integer agg over the
    # pinned edge list, plus two deliberate single-row broadcasts per
    # round (node count, dangling total) that compile to
    # BroadcastNestedLoopJoin on 1-row frames — same annotated pattern
    # as the other scalar crossJoins.  No window, no cartesian.
    "graph_opic": ([], ["Window", "CartesianProduct"]),
    # SimHash near-dup pairs: candidates from the (block, value)
    # equi-join — hash join, never nested-loop/cartesian pairing, no
    # window; verification is an in-row bit_count(xor)
    "docs_simhash_near_pairs": ([], ["BroadcastNestedLoopJoin",
                                     "CartesianProduct", "Window"]),
    # KN bigram LM: in-row bigram derivation (arrays_zip of slices),
    # three linear type-keyed aggs + keyed scoring join + one 1-row
    # total broadcast — no window, no cartesian
    "docs_kn_bigram_bits": (["HashAggregate"],
                            ["Window", "CartesianProduct"]),
    # mixture rebalance: one stratum count agg broadcast back + a 1-row
    # bottleneck broadcast; keep decision is in-row — no second
    # shuffle, no window, no cartesian
    "docs_source_rebalance": (["BroadcastHashJoin"],
                              ["Window", "CartesianProduct",
                               "SortMergeJoin"]),
    # composed simhash dedup: block-join pair generation + star-CC
    # rounds — keyed joins and linear aggs only, no window, no
    # cartesian, no nested-loop pairing
    "docs_simhash_dedup_clusters": ([], ["Window", "CartesianProduct",
                                         "BroadcastNestedLoopJoin"]),
    # containment: per-doc prefix window + keyed shingle hash joins —
    # the Window is the per-doc rank (partitioned, never global); no
    # cartesian, no nested loop
    "docs_containment_pairs": ([], ["CartesianProduct",
                                    "BroadcastNestedLoopJoin"]),
    # RFC 9309 matcher: rules (the robots cache) broadcast onto the
    # frontier batch; precedence is one integer MAX agg — no window, no
    # cartesian, no nested loop
    "frontier_robots_rep": (["BroadcastHashJoin"],
                            ["Window", "CartesianProduct",
                             "BroadcastNestedLoopJoin", "SortMergeJoin"]),
    # C4 line/page filters: pure in-row expressions over the lined
    # fixture — no shuffle anywhere in the plan
    "docs_c4_clean": (["ReadSchema: struct<doc_id:bigint,text:string>"],
                      ["Exchange", "Window", "CartesianProduct"]),
    # C4 span dedup: groupBy-min first occurrence + keyed joins — never
    # a window over the (hot) span key, no cartesian/nested-loop pairing
    "docs_c4_span_dedup": (["HashAggregate"],
                           ["Window", "CartesianProduct",
                            "BroadcastNestedLoopJoin"]),
    # A-Res weighted sample: in-row key + global top-k — per-partition
    # heaps merged once, never a global sort or window
    "docs_weighted_sample": (["TakeOrderedAndProject"],
                             ["Window", "Exchange", "CartesianProduct"]),
    # LPA: per half-step keyed join + (node,label) count + node-keyed
    # argmin agg — the count/min-label tie-break is min(struct(-c,l)),
    # never a window; no cartesian/nested-loop anywhere
    "graph_lpa": (["HashAggregate"],
                  ["Window", "CartesianProduct",
                   "BroadcastNestedLoopJoin"]),
    # compact-forward triangles: keyed self-joins of the ORIENTED edge
    # list + explode-count — wedge generation bounded O(m^1.5) by the
    # degree orientation; no window, no cartesian
    "graph_triangles": (["HashAggregate"],
                        ["Window", "CartesianProduct",
                         "BroadcastNestedLoopJoin"]),
    # per-doc TextRank: (doc,word)-keyed linear passes; the ONE Window
    # is the per-document top-k (partitioned, never global)
    "docs_textrank_keywords": (["Window"],
                               ["CartesianProduct",
                                "BroadcastNestedLoopJoin"]),
    # temperature sampling: stratum counts broadcast back, keep decision
    # in-row integer compare.  (The one BroadcastNestedLoopJoin is the
    # deliberate 1-row bottleneck broadcast, the rebalance contract.)
    "docs_temperature_sample": (["BroadcastHashJoin"],
                                ["Window", "CartesianProduct",
                                 "SortMergeJoin"]),
    # PMI: token-keyed linear aggs, vocab-level joins, 1-row total
    # broadcasts, global top-k — no window, no cartesian
    "docs_pmi_collocations": (["TakeOrderedAndProject"],
                              ["Window", "CartesianProduct"]),
    # JL projection: in-row explode + broadcast sign table + keyed
    # linear agg — no window, no cartesian
    "emb_jl_project": (["BroadcastHashJoin"],
                       ["Window", "CartesianProduct", "SortMergeJoin"]),
    # phrase search: postings pruned to phrase terms pre-shuffle, then
    # (doc,pos)-keyed equi-joins — no window, no cartesian
    "docs_phrase_search": (["HashAggregate"],
                           ["Window", "CartesianProduct",
                            "BroadcastNestedLoopJoin"]),
    # RRF: the two Windows are row_number over the BOUNDED top-20 lists
    # (post-limit), never the corpus; fusion joins tiny frames
    "docs_hybrid_rrf": (["Window"], ["CartesianProduct"]),
    # z-order layout: in-row bit interleave + one keyed agg — no join,
    # no window, no cartesian
    "events_zorder_layout": (["HashAggregate"],
                             ["Window", "CartesianProduct", "Join"]),
    # CDC dedup: in-row boundaries + groupBy-min first occurrence —
    # never a window over the (hot) chunk key, no cartesian
    "docs_cdc_dedup": (["HashAggregate"],
                       ["Window", "CartesianProduct",
                        "BroadcastNestedLoopJoin"]),
    # BFS: per round keyed join + MIN agg — no window, no cartesian.
    # (The per-round aggs hide behind the lazy localCheckpoint lineage
    # truncation, so only the absence list is assertable here.)
    "graph_bfs_hops": ([],
                       ["Window", "CartesianProduct",
                        "BroadcastNestedLoopJoin"]),
    # entropy: (doc,symbol)-keyed count aggs + doc-keyed fold — no
    # window, no cartesian
    "docs_entropy_signals": (["HashAggregate"],
                             ["Window", "CartesianProduct",
                              "BroadcastNestedLoopJoin"]),
    # winnowing: in-row O(n·w) fold, then hash-keyed groupBy + join
    # back — no window operator, no cartesian
    "docs_winnow_fingerprints": (["HashAggregate"],
                                 ["Window", "CartesianProduct",
                                  "BroadcastNestedLoopJoin"]),
    # Naive Bayes: keyed count aggs, broadcast k-class/scalar sides,
    # token-keyed score join — never doc×doc, no window, no sort-merge
    # on the token key (lambda side broadcasts at this scale; the
    # deliberate k-row crossJoins are broadcast)
    "docs_nb_langid": (["HashAggregate", "BroadcastHashJoin"],
                       ["Window", "CartesianProduct"]),
    # trustrank: per round one keyed join + dst-keyed linear agg, seed
    # vector broadcast — no window, no cartesian (per-round plans hide
    # behind the lazy localCheckpoint lineage truncation)
    "graph_trustrank": ([],
                        ["Window", "CartesianProduct",
                         "BroadcastNestedLoopJoin"]),
    # k-core h-index rounds: keyed join + collect/fold agg per round,
    # in-row h-index — no cartesian, no nested-loop
    "graph_kcore": ([],
                    ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # SURT: pure in-row string expressions over a generated range —
    # no shuffle at all, no join, no window
    "frontier_surt_keys": ([], ["Exchange", "Window", "Join",
                                "CartesianProduct"]),
    # funnel: k filtered user-keyed MIN aggs + user-keyed joins, stage
    # filters pushed to the scan — no window, no sort.  (The one
    # BroadcastNestedLoopJoin is the deliberate 1-row stage-1-count
    # broadcast for the conversion denominator, bounded by design —
    # same precedent as docs_ccnet_buckets' totals.)
    "events_funnel": (["PushedFilters"],
                      ["Window", "CartesianProduct"]),
    # retention: user-keyed MIN + join back + (cohort,offset) agg —
    # all linear keyed passes, no window
    "events_retention_cohorts": (["HashAggregate"],
                                 ["Window", "CartesianProduct",
                                  "BroadcastNestedLoopJoin"]),
    # exact harmonic: per-round keyed join + distinct + count agg —
    # the documented small-graph VERIFIER (O(n·ball) pairs)
    "graph_harmonic_exact": ([],
                             ["Window", "CartesianProduct",
                              "BroadcastNestedLoopJoin"]),
    # hyperball: one dst-keyed join + (node,reg)-keyed MAX agg per
    # round over the bounded register table — the scale path
    "graph_hyperball": ([],
                        ["Window", "CartesianProduct",
                         "BroadcastNestedLoopJoin"]),
    # BPE pretokens: in-row regexp + array ops — zero shuffle
    "docs_bpe_pretokens": (
        ["ReadSchema: struct<doc_id:bigint,text:string>"],
        ["Exchange", "Window", "Join", "CartesianProduct"]),
    # rendezvous: in-row argmax over the per-key hash array — zero
    # shuffle, no join
    "docs_rendezvous_shards": (
        ["ReadSchema: struct<doc_id:bigint>"],
        ["Exchange", "Window", "Join", "CartesianProduct"]),
    # RAKE: one per-doc islands window + keyed aggs + bounded top-k
    # window — no cartesian, no nested-loop
    "docs_rake_keywords": (["Window"],
                           ["CartesianProduct",
                            "BroadcastNestedLoopJoin"]),
    # fuzzy join: token-keyed equi-join with in-join length filter,
    # verify on candidates only — never all-pairs, no UDF
    "part_fuzzy_name_pairs": ([],
                              ["CartesianProduct",
                               "BroadcastNestedLoopJoin", "Window"]),
    # Yule/Simpson: (doc,token) count agg + doc-keyed fold — no
    # window, no join
    "docs_yule_richness": (["HashAggregate"],
                           ["Window", "Join", "CartesianProduct"]),
    # Heaps fit: token-keyed aggs + ONE deliberate window over the
    # document-count measurement series (sublinear in the token
    # stream, the zipf_stats proportionality argument) — no cartesian
    "docs_heaps_fit": (["HashAggregate"], ["CartesianProduct"]),
    # Adamic-Adar: middle-keyed two-hop equi-join bounded by the
    # degree cap + keyed aggs + anti join — no cartesian, no window
    "graph_adamic_adar": ([],
                          ["Window", "CartesianProduct",
                           "BroadcastNestedLoopJoin"]),
    # encoding triage: in-row regexp counts — zero shuffle
    "docs_encoding_signals": (
        ["ReadSchema: struct<doc_id:bigint,text:string>"],
        ["Exchange", "Window", "Join", "CartesianProduct"]),
    # Benford: filter pushed to scan, keyed counts + 9-digit explode
    # + group-keyed folds — no cartesian, no nested-loop
    "events_benford": (["PushedFilters"],
                       ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # assortativity: degree agg + edge-keyed degree joins + one scalar
    # fold — no window, no cartesian
    "graph_assortativity": ([],
                            ["Window", "CartesianProduct",
                             "BroadcastNestedLoopJoin"]),
    # ANF: hyperball register rounds + exact micro-sum totals; the
    # R+1 one-row total frames combine via bounded broadcasts
    "graph_eff_diameter": ([], ["Window", "CartesianProduct"]),
    # SALSA: per half-round one keyed join + keyed integer agg over
    # the pinned edge list — no window, no cartesian
    "graph_salsa": ([],
                    ["Window", "CartesianProduct",
                     "BroadcastNestedLoopJoin"]),
    # CUSUM: hourly agg + per-group prefix/running-min windows over
    # the (sublinear) hourly series — no cartesian
    "events_cusum_peak": (["Window"],
                          ["CartesianProduct",
                           "BroadcastNestedLoopJoin"]),
    # Broder estimator audit: (band,bucket) equi-join candidates,
    # seed-keyed agreement join, exact verify on candidates only —
    # never all-pairs
    "docs_minhash_jaccard_est": ([],
                                 ["CartesianProduct",
                                  "BroadcastNestedLoopJoin"]),
}

# builders audited outside the registered query surface
def _routed_paginate_plan(spark, sf_dir):
    """paginate routed ABOVE the window threshold: the offset page must
    compile to TakeOrderedAndProject with NO window operator at all."""
    from pyspark.sql import functions as F

    from pink_spider_spark.operators import relational as R

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return R.paginate(
        orders, [F.desc("o_orderdate"), F.asc("o_orderkey")],
        page=2, per_page=25, window_threshold=0)


EXTRA_CHECKS = {
    "paginate_routed_offset": (_routed_paginate_plan,
                               ["TakeOrderedAndProject"], ["Window"]),
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pink_spider_spark import queries as Q
    from pink_spider_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    failures = []
    checks = {name: (lambda s, d, n=name: Q.QUERY_BUILDERS[n](s, d), must, must_not)
              for name, (must, must_not) in CHECKS.items()}
    checks.update(EXTRA_CHECKS)
    for name, (builder, must, must_not) in checks.items():
        df = builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        probs = [f"missing: {m}" for m in must if m not in plan]
        probs += [f"present: {m}" for m in must_not if m in plan]
        status = "ok  " if not probs else "FAIL"
        print(f"{status} {name}" + (f" — {'; '.join(probs)}" if probs else ""))
        if probs:
            failures.append(name)
            print(plan[:4000])
    print(f"\n{len(checks) - len(failures)}/{len(checks)} plans as designed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
