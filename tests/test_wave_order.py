"""wave_order: the distributed large-batch strategy must produce exactly
the same global sequence as the single-window strategy."""

import pyspark.sql.functions as F

from pink_spider_spark.crawl import scheduler


def test_distributed_wave_order_matches_window(spark):
    rows = [(f"https://h{i % 7}.example.com/p/{i:05d}", float((i * 13) % 5))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["url", "priority"])

    via_window = {
        r.url: r.wave_pos
        for r in scheduler.wave_order(df, distributed_threshold=10**9).collect()}
    via_distributed = {
        r.url: r.wave_pos
        for r in scheduler.wave_order(df, distributed_threshold=0).collect()}

    assert via_window == via_distributed
    # dense 1..n sequence
    assert sorted(via_distributed.values()) == list(range(1, len(rows) + 1))


def test_distributed_wave_order_columns_clean(spark):
    rows = [(f"https://x.example.com/{i}", 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, ["url", "priority"])
    out = scheduler.wave_order(df, distributed_threshold=0)
    assert set(out.columns) == {"url", "priority", "wave_pos"}
