"""Link-graph PageRank (crawl/rank.py) — hand-computed pins."""

from pink_spider_spark.crawl import rank as K


def test_pagerank_hand_graph_one_round(spark):
    # a->b, a->c, b->c ; n=3, init 1/3, d=0.85
    # contribs: b <- a/2 = 1/6 ; c <- a/2 + b/1 = 1/2
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"])
    r = {x.node: x.rank for x in K.pagerank(edges, iters=1).collect()}
    assert r["a"] == 0.05                       # teleport only (no in-edges)
    assert r["b"] == round(0.05 + 0.85 / 6, 8)  # 0.19166667
    assert r["c"] == round(0.05 + 0.85 / 2, 8)  # 0.475
    # ranks are rounded to 8 dp each, so the sum is within ~n*5e-9
    assert abs(sum(r.values()) - (0.05 * 3 + 0.85 * (1 / 6 + 1 / 2))) < 1e-7


def test_pagerank_duplicate_edges_collapse(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], ["src", "dst"])
    r = {x.node: x.rank for x in K.pagerank(edges, iters=1).collect()}
    # outdeg(a) must be 2 (distinct), so b gets a/2 not 2a/3
    assert r["b"] == round(0.15 / 3 + 0.85 * (1 / 3) / 2, 8)


def test_host_pagerank_edges_and_self_loops(spark):
    entries = spark.createDataFrame(
        [("http://a.com/x", ["http://b.com/y", "http://a.com/self"]),
         ("http://b.com/z", ["http://a.com/q"])],
        ["url", "links"])
    r = {x.node: x.rank for x in K.host_pagerank(entries, iters=1).collect()}
    assert set(r) == {"a.com", "b.com"}          # self-loop dropped
    # symmetric 2-cycle: both converge to 1/2-ish teleport+mass
    assert r["a.com"] == r["b.com"] == round(0.15 / 2 + 0.85 / 2, 8)


def test_with_host_rank_priority(spark):
    frontier = spark.createDataFrame(
        [("http://a.com/1", 7), ("http://nowhere.org/2", 7)],
        ["url", "priority"])
    ranks = spark.createDataFrame([("a.com", 0.25)], ["node", "rank"])
    out = {r.url: r.priority for r in
           K.with_host_rank_priority(frontier, ranks).collect()}
    assert out["http://a.com/1"] == 250_000
    assert out["http://nowhere.org/2"] == 0      # unknown host -> 0


def test_with_host_rank_priority_large_graph_keyed_join(spark):
    # above the broadcast bound the join degrades to a keyed join (no
    # explicit broadcast hint) and results are unchanged
    from pink_spider_spark.crawl.rank import with_host_rank_priority
    frontier = spark.createDataFrame(
        [("http://a.com/1", 7), ("http://nowhere.org/2", 7)],
        ["url", "priority"])
    ranks = spark.createDataFrame(
        [("a.com", 0.25), ("b.com", 0.1), ("c.com", 0.2)],
        ["node", "rank"])
    out = {r.url: r.priority for r in
           with_host_rank_priority(frontier, ranks,
                                   max_broadcast_nodes=2).collect()}
    assert out["http://a.com/1"] == 250_000
    assert out["http://nowhere.org/2"] == 0


# ----------------------------------------------------------- HITS
def test_hits_hand_graph_two_rounds(spark):
    # a->b, a->c, b->c — integer-exact trajectory computed by hand:
    # r1: auth (b 1/3, c 2/3) -> a1 = (0, 33333333, 66666667)
    #     hub raw (a 1e8, b 66666667) -> h1 = (60000000, 40000000, 0)
    # r2: auth raw (b 6e7, c 1e8), tot 1.6e8 -> a2 = (0, .375, .625)
    #     hub raw (a 1e8, b 62500000), tot 1.625e8
    #     -> h2 = (61538462, 38461538, 0)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"])
    r = {x.node: (x.auth, x.hub) for x in K.hits(edges, iters=2).collect()}
    assert r["a"] == (0.0, 0.61538462)
    assert r["b"] == (0.375, 0.38461538)
    assert r["c"] == (0.625, 0.0)


def test_hits_star_graph_center_is_the_authority(spark):
    edges = spark.createDataFrame(
        [(f"s{i}", "center") for i in range(5)], ["src", "dst"])
    r = {x.node: (x.auth, x.hub) for x in K.hits(edges, iters=2).collect()}
    assert r["center"] == (1.0, 0.0)       # all authority mass
    for i in range(5):                     # spokes split hub mass evenly
        assert r[f"s{i}"] == (0.0, 0.2)


def test_hits_duplicate_edges_collapse(spark):
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c")], ["src", "dst"])
    ded = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"])
    rd = {x.node: (x.auth, x.hub) for x in K.hits(dup, iters=2).collect()}
    rr = {x.node: (x.auth, x.hub) for x in K.hits(ded, iters=2).collect()}
    assert rd == rr


# ----------------------------------------------------------- OPIC
def test_opic_hand_graph_three_rounds(spark):
    # a->b, a->c, b->c — integer-exact cash/history trajectory by hand
    # (init 1e8 each; c is dangling -> virtual-page uniform respray):
    # r1: shares a->{b,c} 5e7, b->c 1e8, dangling dt=1e8 -> respray 33333333
    #     c = (33333333, 83333333, 183333333), h = (1e8, 1e8, 1e8)
    # r2: a 33333333//2=16666666, b->c 83333333, dt=183333333 -> 61111111
    #     c = (61111111, 77777777, 161111110)
    #     h = (133333333, 183333333, 283333333)
    # r3: a 61111111//2=30555555, b->c 77777777, dt=161111110 -> 53703703
    #     c = (53703703, 84259258, 162037035)
    #     h = (194444444, 261111110, 444444443)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"])
    rows = {x.node: x for x in K.opic(edges, iters=3).collect()}
    assert (rows["a"].history8, rows["a"].cash8) == (194444444, 53703703)
    assert (rows["b"].history8, rows["b"].cash8) == (261111110, 84259258)
    assert (rows["c"].history8, rows["c"].cash8) == (444444443, 162037035)
    tot = sum(r.history8 + r.cash8 for r in rows.values())
    assert tot == 1199999993          # 3e8 minus 7 units of div remainder
    for n, r in rows.items():
        assert r.importance == round((r.history8 + r.cash8) / tot, 8)
    # the sink accumulates the most importance, the source the least
    assert rows["c"].importance > rows["b"].importance > rows["a"].importance


def test_opic_duplicate_edges_collapse(spark):
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c")], ["src", "dst"])
    ded = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"])
    rd = {x.node: (x.history8, x.cash8) for x in K.opic(dup, iters=2).collect()}
    rr = {x.node: (x.history8, x.cash8) for x in K.opic(ded, iters=2).collect()}
    assert rd == rr


def test_opic_cash_conservation_up_to_div_remainders(spark):
    # CASH is conserved round-over-round (history BANKS each round's
    # distributed cash, so H+C grows to (iters+1)·n·1e8 by design):
    # per round the circulating total shrinks only by the integer-div
    # remainders — < outdeg units per distributing node plus < n at the
    # virtual page
    iters, edges_list = 4, [("a", "b"), ("b", "c"), ("c", "d"),
                            ("d", "a"), ("a", "c"), ("b", "d")]
    edges = spark.createDataFrame(edges_list, ["src", "dst"])
    rows = K.opic(edges, iters=iters).collect()
    n, n_edges = len(rows), len(edges_list)
    cash = sum(r.cash8 for r in rows)
    loss_bound = iters * (n_edges + n)
    assert n * 100_000_000 - loss_bound <= cash <= n * 100_000_000
    tot = sum(r.history8 + r.cash8 for r in rows)
    assert (iters + 1) * n * 100_000_000 - (iters + 1) * loss_bound \
        <= tot <= (iters + 1) * n * 100_000_000


def test_opic_star_graph_center_hoards_importance(spark):
    edges = spark.createDataFrame(
        [(f"s{i}", "center") for i in range(5)], ["src", "dst"])
    rows = {x.node: x for x in K.opic(edges, iters=2).collect()}
    assert all(rows["center"].importance > rows[f"s{i}"].importance
               for i in range(5))


def test_host_opic_plugs_into_priority_join(spark):
    # host_opic emits (node, rank) — the with_host_rank_priority contract
    entries = spark.createDataFrame(
        [("http://a.com/x", ["http://b.com/y", "http://a.com/self"]),
         ("http://b.com/z", ["http://a.com/q"])],
        ["url", "links"])
    ranks = K.host_opic(entries, iters=2)
    assert ranks.columns == ["node", "rank"]
    r = {x.node: x.rank for x in ranks.collect()}
    assert set(r) == {"a.com", "b.com"}          # self-loop dropped
    assert r["a.com"] == r["b.com"] == 0.5       # symmetric 2-cycle
    frontier = spark.createDataFrame(
        [("http://a.com/1", 7), ("http://nowhere.org/2", 7)],
        ["url", "priority"])
    out = {x.url: x.priority for x in
           K.with_host_rank_priority(frontier, ranks).collect()}
    assert out["http://a.com/1"] == 500_000
    assert out["http://nowhere.org/2"] == 0


# ------------------------------------------------------------ trustrank
def test_trustrank_unreachable_from_seeds_scores_zero(spark):
    # seed -> a -> b chain plus a disconnected spam 2-cycle: the spam
    # cluster manufactures rank among itself under PageRank but gets
    # EXACTLY 0.0 trust (the demotion property)
    edges = spark.createDataFrame(
        [("seed", "a"), ("a", "b"), ("spam1", "spam2"),
         ("spam2", "spam1")], ["src", "dst"])
    seeds = spark.createDataFrame([("seed",)], ["node"])
    r = {x.node: x.rank for x in K.trustrank(edges, seeds).collect()}
    assert r["spam1"] == 0.0 and r["spam2"] == 0.0
    assert r["seed"] > 0 and r["a"] > 0 and r["b"] > 0
    pr = {x.node: x.rank for x in K.pagerank(edges).collect()}
    assert pr["spam1"] > 0  # the contrast: PageRank can't tell


def test_trustrank_hand_graph_one_round(spark):
    # seed -> x, seed -> y; s = (1, 0, 0); one round:
    # seed: 0.15*1 + 0; x,y: 0 + 0.85 * (1.0 / 2)
    edges = spark.createDataFrame([("seed", "x"), ("seed", "y")],
                                  ["src", "dst"])
    seeds = spark.createDataFrame([("seed",)], ["node"])
    r = {x.node: x.rank for x in
         K.trustrank(edges, seeds, iters=1).collect()}
    assert r["seed"] == 0.15
    assert r["x"] == r["y"] == round(0.85 * 0.5, 8)


def test_trustrank_matches_python_twin(spark):
    # exact trajectory equality (8-dp rounds) vs a sequential twin on a
    # small graph with fan-out, convergence and a sink
    E = [("s0", "a"), ("s0", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("d", "a"), ("s1", "d"), ("s1", "a")]
    seeds_l = ["s0", "s1"]
    nodes = sorted({u for e in E for u in e})
    out = {n: [v for u, v in E if u == n] for n in nodes}
    s = {n: (1.0 / len(seeds_l) if n in seeds_l else 0.0) for n in nodes}
    r = {n: round(s[n], 8) for n in nodes}
    for _ in range(3):
        c = {n: 0.0 for n in nodes}
        for u in nodes:
            for v in out[u]:
                c[v] += r[u] / len(out[u])
        r = {n: round(0.15 * s[n] + 0.85 * c[n], 8) for n in nodes}
    edges = spark.createDataFrame(E, ["src", "dst"])
    seeds = spark.createDataFrame([(x,) for x in seeds_l], ["node"])
    got = {x.node: x.rank for x in
           K.trustrank(edges, seeds, iters=3).collect()}
    assert got == r


# -------------------------------------------------------- host harmonic
def test_host_harmonic_plugs_into_priority_join(spark):
    entries = spark.createDataFrame(
        [("http://a.com/x", ["http://b.com/y", "http://c.com/z",
                             "http://a.com/self"]),
         ("http://b.com/z", ["http://a.com/q"]),
         ("http://c.com/w", ["http://b.com/r"])],
        ["url", "links"])
    ranks = K.host_harmonic(entries, rounds=2)
    assert ranks.columns == ["node", "rank"]
    r = {x.node: x.rank for x in ranks.collect()}
    assert set(r) == {"a.com", "b.com", "c.com"}  # self-loop dropped
    # fully-connected-ish triangle: every host reaches the other two in
    # <= 2 hops; harmonic estimates are positive and near-equal
    assert all(v > 0 for v in r.values())
    frontier = spark.createDataFrame(
        [("http://a.com/1", 7), ("http://nowhere.org/2", 7)],
        ["url", "priority"])
    out = {x.url: x.priority for x in
           K.with_host_rank_priority(frontier, ranks).collect()}
    assert out["http://a.com/1"] > 0
    assert out["http://nowhere.org/2"] == 0


# ---------------------------------------------------------------- SALSA
def test_salsa_tkc_contrast_with_hits(spark):
    # the Lempel-Moran TKC example: a tight 3x3 mutual-admiration block
    # (h1-3 -> a1-3, complete) vs one authority b with FOUR independent
    # hubs.  HITS's eigenvector concentrates on the clique; SALSA's
    # degree-proportional walk ranks b above every clique authority.
    E = [(f"h{i}", f"a{j}") for i in range(3) for j in range(3)]
    E += [(f"g{i}", "b") for i in range(4)]
    edges = spark.createDataFrame(E, ["src", "dst"])
    s = {r.node: r.auth8 for r in K.salsa(edges, iters=4).collect()}
    assert s["b"] > s["a0"]  # indeg 4 beats the clique's 3
    h = {r.node: r.auth for r in K.hits(edges, iters=6).collect()}
    assert h["a0"] > h["b"]  # the TKC effect SALSA exists to fix


def test_salsa_matches_python_twin(spark):
    E = [("u1", "v1"), ("u1", "v2"), ("u2", "v2"), ("u2", "v3"),
         ("u3", "v1"), ("v1", "v2")]  # v1 is both authority and hub
    outd, ind = {}, {}
    for a, b in set(E):
        outd[a] = outd.get(a, 0) + 1
        ind[b] = ind.get(b, 0) + 1
    h = {u: 10**8 for u in outd}
    a = {}
    for _ in range(2):
        a = {}
        for u, v in set(E):
            a[v] = a.get(v, 0) + h[u] // outd[u]
        h = {}
        for u, v in set(E):
            h[u] = h.get(u, 0) + a[v] // ind[v]
    out = {r.node: (r.auth8, r.hub8) for r in
           K.salsa(spark.createDataFrame(E, ["src", "dst"]),
                   iters=2).collect()}
    for n in out:
        assert out[n] == (a.get(n, 0), h.get(n, 0))


def test_salsa_even_split_shares(spark):
    # one hub, two authorities: each gets floor(1e8/2)
    E = [("h", "x"), ("h", "y")]
    out = {r.node: r.auth8 for r in
           K.salsa(spark.createDataFrame(E, ["src", "dst"]),
                   iters=1).collect()}
    assert out["x"] == out["y"] == 50_000_000


# ---------------------------------------------- Kendall tau-b agreement
def test_rank_tau_identical_and_reversed(spark):
    from pyspark.sql import functions as F

    from pink_spider_spark.crawl import rank as K

    a = spark.createDataFrame(
        [(f"n{i}", float(i)) for i in range(6)], ["node", "rank"])
    rev = spark.createDataFrame(
        [(f"n{i}", float(-i)) for i in range(6)], ["node", "rank"])
    (same,) = K.rank_agreement_tau(a, a).collect()
    assert same.tau_b == 1.0 and same.discordant == 0
    (opp,) = K.rank_agreement_tau(a, rev).collect()
    assert opp.tau_b == -1.0 and opp.concordant == 0


def test_rank_tau_matches_scipy_free_twin(spark):
    import math

    from pink_spider_spark.crawl import rank as K

    sa = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    sb = [2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0]
    a = spark.createDataFrame(
        [(f"n{i}", v) for i, v in enumerate(sa)], ["node", "rank"])
    b = spark.createDataFrame(
        [(f"n{i}", v) for i, v in enumerate(sb)], ["node", "rank"])
    (r,) = K.rank_agreement_tau(a, b).collect()
    c = d = ta = tb = n0 = 0
    for i in range(len(sa)):
        for j in range(i + 1, len(sa)):
            n0 += 1
            da = (sa[i] > sa[j]) - (sa[i] < sa[j])
            db = (sb[i] > sb[j]) - (sb[i] < sb[j])
            c += da * db > 0
            d += da * db < 0
            ta += da == 0
            tb += db == 0
    tau = (c - d) / math.sqrt((n0 - ta) * (n0 - tb))
    assert (r.concordant, r.discordant) == (c, d)
    assert r.tau_b == round(tau, 4)
