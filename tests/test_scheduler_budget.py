"""Direct unit tests for the salted two-phase per-host budget dequeue:
the salted form must be result-identical to the naive single-window
per-host top-k under heavy-host skew (SURVEY §7.3-4)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pink_spider_spark.crawl import scheduler


def _candidates(spark):
    """600 URLs over 11 hosts; host h0 holds half (heavy-host skew),
    with deliberate priority ties so the url ASC tie-break matters."""
    rows = []
    for i in range(300):
        rows.append((f"https://h0.example/p{i:04d}", "h0.example",
                     float(i % 7), 16))
    for h in range(1, 11):
        for i in range(30):
            rows.append((f"https://h{h}.example/p{i:04d}", f"h{h}.example",
                         float(i % 3), 4 if h % 2 else 16))
    return spark.createDataFrame(
        rows, ["url", "host", "priority", "max_per_wave"])


def _naive_topk(df):
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("url"))
    return (df.withColumn("host_rank", F.row_number().over(w))
            .filter(F.col("host_rank") <= F.col("max_per_wave")))


def test_salted_budget_equals_naive_window(spark):
    cand = _candidates(spark)
    got = {(r.url, r.host_rank)
           for r in scheduler.per_host_budget_batch(cand).collect()}
    want = {(r.url, r.host_rank) for r in _naive_topk(cand).collect()}
    assert got == want


def test_budget_respected_per_host(spark):
    cand = _candidates(spark)
    out = (scheduler.per_host_budget_batch(cand)
           .groupBy("host", "max_per_wave")
           .agg(F.count("*").alias("n"), F.max("host_rank").alias("mx"))
           .collect())
    for r in out:
        assert r.n <= r.max_per_wave
        assert r.mx == r.n  # ranks are 1..n dense


def test_budget_larger_than_salt_phase_cap(spark):
    """A host whose budget exceeds its per-bucket share still gets its
    full budget: the salt phase keeps k per (host, bucket), which is
    always >= k per host overall."""
    rows = [(f"https://big.example/p{i:03d}", "big.example", 1.0, 100)
            for i in range(120)]
    cand = spark.createDataFrame(
        rows, ["url", "host", "priority", "max_per_wave"])
    out = scheduler.per_host_budget_batch(cand)
    assert out.count() == 100
    # exact-order contract: ranks follow url ASC on the priority tie
    first = out.filter(F.col("host_rank") == 1).first()
    assert first.url == "https://big.example/p000"


@pytest.mark.parametrize("budget", [0, 1])
def test_budget_edge_values(spark, budget):
    rows = [(f"https://e.example/{i}", "e.example", float(i), budget)
            for i in range(5)]
    cand = spark.createDataFrame(
        rows, ["url", "host", "priority", "max_per_wave"])
    out = scheduler.per_host_budget_batch(cand).collect()
    assert len(out) == budget
    if budget == 1:
        assert out[0].url == "https://e.example/4"  # highest priority
