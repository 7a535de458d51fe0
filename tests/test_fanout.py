"""fan_out: the minimum-parallelism guard for compute-amplifying
operators (functions/fanout.py).  Contract: repartition to the session
parallelism ONLY when the incoming frame has fewer partitions; any
frame already at/above it passes through untouched (the at-scale
no-op), and values/rows are never affected either way."""

from pink_spider_spark.functions.fanout import fan_out


def test_fan_out_raises_underpartitioned_frame(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, 1)  # one partition, like a small file
    out = fan_out(df)
    assert out.rdd.getNumPartitions() == par
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_fan_out_noop_at_or_above_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    at = spark.range(0, 1000, 1, par)
    above = spark.range(0, 1000, 1, par + 4)
    # identity — not merely same partition count: no exchange inserted
    assert fan_out(at) is at
    assert fan_out(above) is above


def test_fan_out_min_parts_override(spark):
    df = spark.range(0, 100, 1, 2)
    assert fan_out(df, min_parts=8).rdd.getNumPartitions() == 8
    assert fan_out(df, min_parts=2) is df
