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
