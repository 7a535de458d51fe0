"""KMV distinct sketch (functions/sketches.py) — python-twin pins."""

import hashlib

from pink_spider_spark.functions import sketches as SK


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)] * 3, ["grp", "val"])
    r = SK.kmv_distinct(df, ["grp"], "val", k=64).collect()[0]
    assert r.exact_distinct == 10
    assert r.kmv_estimate == 10.0  # below k the sketch is exact


def test_kmv_estimate_matches_python_twin(spark):
    vals = [f"item{i}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "val"])
    k = 16
    r = SK.kmv_distinct(df, ["grp"], "val", k=k).collect()[0]
    kth = sorted(_h60(v) for v in set(vals))[k - 1]
    expected = round((k - 1) * ((1 << 60) / kth), 4)
    assert r.exact_distinct == 500
    assert r.kmv_estimate == expected
    # a 16-min sketch of 500 distinct should land within ~50%
    assert 250 < r.kmv_estimate < 1000


def test_kmv_multi_group_and_salt_invariance(spark):
    rows = [("a", f"x{i}") for i in range(100)] + \
           [("b", f"y{i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    r1 = {r.grp: r.kmv_estimate
          for r in SK.kmv_distinct(df, ["grp"], "val", k=32,
                                   salts=4).collect()}
    r2 = {r.grp: r.kmv_estimate
          for r in SK.kmv_distinct(df, ["grp"], "val", k=32,
                                   salts=64).collect()}
    assert r1 == r2  # salting is an execution detail, not a semantic one
    assert r2["b"] == 20.0  # below k -> exact


# ------------------------------------------------- count-min sketch
def test_cms_estimate_upper_bounds_exact_and_is_exact_when_sparse(spark):
    from pink_spider_spark.functions import sketches as SK

    rows = [(u,) for u in ["a"] * 50 + ["b"] * 7 + ["c"] * 1]
    df = spark.createDataFrame(rows, ["k"])
    counters = SK.cms_counters(df, "k", depth=4, width=1024)
    est = {r.k: r.cms_est for r in
           SK.cms_estimate(counters, df, "k", depth=4, width=1024)
           .collect()}
    # 3 keys in 4x1024 cells: no collisions -> estimates are EXACT
    assert est == {"a": 50, "b": 7, "c": 1}


def test_cms_overcounts_on_forced_collision_never_undercounts(spark):
    from pink_spider_spark.functions import sketches as SK

    # width=1: every key collides in every row -> every estimate is the
    # total stream length (the degenerate upper bound), never below
    rows = [(u,) for u in ["x"] * 5 + ["y"] * 3]
    df = spark.createDataFrame(rows, ["k"])
    counters = SK.cms_counters(df, "k", depth=4, width=1)
    est = {r.k: r.cms_est for r in
           SK.cms_estimate(counters, df, "k", depth=4, width=1).collect()}
    assert est == {"x": 8, "y": 8}


def test_cms_estimate_out_of_stream_key_reports_zero(spark):
    from pink_spider_spark.functions import sketches as SK

    stream = spark.createDataFrame([(u,) for u in ["a"] * 5], ["k"])
    probes = spark.createDataFrame([("a",), ("never-seen",)], ["k"])
    counters = SK.cms_counters(stream, "k", depth=4, width=1024)
    est = {r.k: r.cms_est for r in
           SK.cms_estimate(counters, probes, "k", depth=4, width=1024)
           .collect()}
    # a probed key absent from the stream has all-empty cells: the sparse
    # counter table carries no rows for them, and the left-join/coalesce
    # must read them as 0 — not drop the key or min over collisions only
    assert est == {"a": 5, "never-seen": 0}


def test_cms_counters_merge_by_summation(spark):
    from pyspark.sql import functions as F

    from pink_spider_spark.functions import sketches as SK

    rows = [(u,) for u in ["a"] * 10 + ["b"] * 4]
    df = spark.createDataFrame(rows, ["k"])
    half1, half2 = df.limit(7), df.exceptAll(df.limit(7))
    merged = (SK.cms_counters(half1, "k")
              .unionByName(SK.cms_counters(half2, "k"))
              .groupBy("row", "col").agg(F.sum("c").alias("c")))
    whole = SK.cms_counters(df, "k")
    a = {(r.row, r.col): r.c for r in merged.collect()}
    b = {(r.row, r.col): r.c for r in whole.collect()}
    assert a == b  # distributive: partial sketches sum to the full one


# ------------------------------------------------- hyperloglog
def _hll_py(values):
    """Python twin of hll_distinct's register/estimate arithmetic."""
    import math
    regs = {}
    for v in set(values):
        hv = _h60(v)
        idx, w = hv % 1024, hv >> 10
        rho = 51 if w == 0 else 51 - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(1 << (61 - mj) for mj in regs.values())
    s += (1024 - len(regs)) << 61
    raw = SK._HLL_C / float(s)
    v_empty = 1024 - len(regs)
    est = (1024.0 * math.log(1024.0 / float(v_empty))
           if raw <= 2560.0 and v_empty > 0 else raw)
    return round(raw, 4), round(est, 4)


def test_hll_matches_python_twin_small(spark):
    # small cardinality -> linear-counting branch
    vals = [f"user{i}" for i in range(120)]
    df = spark.createDataFrame([("g", v) for v in vals] * 2, ["grp", "val"])
    r = SK.hll_distinct(df, ["grp"], "val").collect()[0]
    raw, est = _hll_py(vals)
    assert r.exact_distinct == 120
    assert r.hll_raw == raw
    assert r.hll_estimate == est
    assert abs(r.hll_estimate - 120) / 120 < 0.15


def test_hll_accuracy_large_raw_branch(spark):
    # 20k distinct >> 2.5m -> uncorrected branch; std err 1.04/sqrt(1024)
    # ~3.3%, assert within 10%
    vals = [f"k{i}" for i in range(20000)]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "val"])
    r = SK.hll_distinct(df, ["grp"], "val").collect()[0]
    raw, est = _hll_py(vals)
    assert r.hll_raw == raw and r.hll_estimate == est
    assert r.hll_estimate == r.hll_raw  # no correction fired
    assert abs(r.hll_estimate - 20000) / 20000 < 0.10


def test_hll_partitioning_invariance_and_groups(spark):
    rows = ([("a", f"x{i}") for i in range(300)]
            + [("b", f"y{i}") for i in range(30)])
    df = spark.createDataFrame(rows, ["grp", "val"])
    r1 = {r.grp: (r.hll_raw, r.hll_estimate)
          for r in SK.hll_distinct(df, ["grp"], "val").collect()}
    r2 = {r.grp: (r.hll_raw, r.hll_estimate)
          for r in SK.hll_distinct(df.repartition(13), ["grp"],
                                   "val").collect()}
    # register max + integer harmonic sum are order-free: any
    # partitioning yields the identical sketch
    assert r1 == r2
    assert set(r1) == {"a", "b"}


# ---------------------------------------------- HyperBall / harmonic
def _h60_py(s):
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_harmonic_exact_matches_bfs_twin(spark):
    from pink_spider_spark.functions import webtext as W
    E = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (7, 8)]
    # python twin: BFS within 3 hops on the symmetrized graph
    import collections
    adj = collections.defaultdict(set)
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    exp = {}
    for v in adj:
        dist = {v: 0}
        q = collections.deque([v])
        while q:
            x = q.popleft()
            if dist[x] == 3:
                continue
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        num = sum(6 // d for d in dist.values() if d > 0)
        exp[v] = (len(dist), num)
    out = {r.node: (r.reachable, r.harmonic_num) for r in
           W.harmonic_exact(None, spark.createDataFrame(E, ["src", "dst"]),
                            rounds=3).collect()}
    assert out == exp


def test_hyperball_registers_match_python_twin_one_round(spark):
    # after one round, node v's register table must equal the HLL
    # registers of {v} ∪ N(v) — HLL union by register-max is exact
    from pink_spider_spark.functions import sketches as SK
    E = [(0, 1), (1, 2), (0, 3)]
    e = spark.createDataFrame(E, ["src", "dst"])
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    regs = SK._hll_self_registers(nodes, "node")
    sym = {0: {0, 1, 3}, 1: {0, 1, 2}, 2: {1, 2}, 3: {0, 3}}
    import collections
    exp = collections.defaultdict(dict)
    for v, ball in sym.items():
        for u in ball:
            hv = _h60_py(str(u))
            reg, w = hv % 1024, hv >> 10
            rho = 51 if w == 0 else 51 - w.bit_length()
            exp[v][reg] = max(exp[v].get(reg, 0), rho)
    merged = SK.hyperball(nodes, e, rounds=1)
    # reproduce via the internal loop: one round of register merge
    from pyspark.sql import functions as F
    e2 = (e.select("src", "dst")
          .union(e.select(F.col("dst").alias("src"),
                          F.col("src").alias("dst"))))
    got_regs = (e2.join(regs.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "reg", "rho")
                .union(regs)
                .groupBy("node", "reg").agg(F.max("rho").alias("rho")))
    got = collections.defaultdict(dict)
    for r in got_regs.collect():
        got[r.node][r.reg] = r.rho
    assert {k: dict(v) for k, v in got.items()} == \
        {k: dict(v) for k, v in exp.items()}
    assert merged.count() == 4


def test_hyperball_estimates_track_exact_ball_sizes(spark):
    from pink_spider_spark.functions import sketches as SK
    from pink_spider_spark.functions import webtext as W
    n = 400
    ids = spark.range(0, n).selectExpr("cast(id as long) id")
    from pyspark.sql import functions as F
    edges = (ids.select(F.col("id").alias("src"),
                        ((F.col("id") + 1) % n).alias("dst"))
             .union(ids.select(F.col("id"), (F.col("id") + 3) % n))
             .union(ids.where(F.col("id") % 7 == 0)
                    .select(F.lit(0).cast("long"), F.col("id"))))
    exact = {r.node: r.reachable for r in
             W.harmonic_exact(None, edges, rounds=3).collect()}
    est = {r.node: r.ball_est for r in
           SK.hyperball(None, edges, rounds=3).collect()}
    errs = [abs(est[v] - exact[v]) / exact[v] for v in exact]
    # 1024 registers -> ~3.25% typical rel. error; generous 15% gate
    assert sum(errs) / len(errs) < 0.15
    # and the hub (node 0) must rank near the top by estimated ball
    top = sorted(est, key=lambda v: -est[v])[:20]
    assert 0 in top


def test_anf_effective_diameter_tracks_exact(spark):
    from pink_spider_spark.functions import sketches as SK
    from pyspark.sql import functions as F
    # path-ish ring: known growth; exact N(t) from harmonic_exact balls
    from pink_spider_spark.functions import webtext as W
    n = 200
    ids = spark.range(0, n).selectExpr("cast(id as long) id")
    edges = (ids.select(F.col("id").alias("src"),
                        ((F.col("id") + 1) % n).alias("dst"))
             .union(ids.select(F.col("id"), (F.col("id") + 5) % n)))
    r = SK.anf_effective_diameter(None, edges, rounds=3).collect()[0]
    ex = {row.node: row.reachable for row in
          W.harmonic_exact(None, edges, rounds=3).collect()}
    n3_exact = sum(ex.values())
    assert abs(r.n_3 - n3_exact) / n3_exact < 0.1
    # growing balls: ring+chord graph far from saturated at t=3
    assert r.n_0 < r.n_1 < r.n_2 < r.n_3
    assert 2.0 < r.eff_diameter <= 3.0  # mass still arriving at t=3


def test_anf_saturated_clique_diameter_one(spark):
    from pink_spider_spark.functions import sketches as SK
    # K8: everyone reaches everyone at t=1 -> eff_diameter interpolates
    # inside (0, 1]
    E = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    r = SK.anf_effective_diameter(
        None, spark.createDataFrame(E, ["src", "dst"]),
        rounds=2).collect()[0]
    assert r.eff_diameter <= 1.0
    assert abs(r.n_1 - r.n_2) < 1e-6  # saturated after one hop


# --------------------------------------------- HLL audience overlap
def test_hll_overlap_disjoint_and_identical(spark):
    import datetime as dt
    T = dt.datetime(2024, 3, 1)
    from pink_spider_spark.functions.sketches import hll_audience_overlap

    # identical audiences: union == each side, est_inter == est_a
    rows = [(u, t, T) for u in range(300) for t in ("view", "purchase")]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    (r,) = hll_audience_overlap(df, "event_type", "user_id",
                                "view", "purchase").collect()
    assert r.n_a_exact == r.n_b_exact == r.inter_exact == 300
    assert r.est_a == r.est_b == r.est_union
    assert r.est_inter == r.est_a
    # disjoint audiences: union registers = superset, inter_exact 0,
    # and the estimator's inclusion-exclusion lands near zero
    rows2 = [(u, "view", T) for u in range(300)]
    rows2 += [(1000 + u, "purchase", T) for u in range(300)]
    df2 = spark.createDataFrame(rows2, ["user_id", "event_type", "ts"])
    (r2,) = hll_audience_overlap(df2, "event_type", "user_id",
                                 "view", "purchase").collect()
    assert r2.inter_exact == 0
    assert abs(r2.est_inter) < 0.2 * 300  # sketch-σ scale, not exact
    # relative error of each single-set estimate ~ 1.04/sqrt(1024)
    for est, exact in ((r2.est_a, 300), (r2.est_b, 300)):
        assert abs(est - exact) / exact < 0.15
