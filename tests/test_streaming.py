"""Structured Streaming ingestion tests (availableNow micro-batches)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pink_spider_spark.crawl.streaming import (
    run_available_now,
    stream_extract,
    windowed_enclosure_counts,
)
from pink_spider_spark.sources.synth import build_catalog_items, gen_pages_spark
from pink_spider_spark.sources.tables import TableStore

N_PAGES = 80


@pytest.fixture(scope="module")
def stream_dirs(spark):
    base = tempfile.mkdtemp(prefix="stream_test_")
    pages_dir = os.path.join(base, "pages")
    items = build_catalog_items()
    gen_pages_spark(spark, N_PAGES, items).write.mode("overwrite").parquet(pages_dir)
    yield base, pages_dir, items
    shutil.rmtree(base, ignore_errors=True)


def test_stream_extract_drains_and_matches_batch(spark, stream_dirs):
    base, pages_dir, items = stream_dirs
    store = TableStore(os.path.join(base, "state"))
    run_available_now(spark, pages_dir, store, items,
                      os.path.join(base, "ckpt"))
    entries = store.table("entries").read(spark)
    assert entries.count() == N_PAGES
    # streamed extraction output equals the batch extractor's golden text
    pages = spark.read.parquet(pages_dir)
    joined = entries.alias("e").join(pages.alias("p"), "url")
    assert joined.filter(F.col("e.text") != F.col("p.text")).count() == 0
    assert store.table("enclosures").read(spark).count() > 0


def test_stream_resume_is_exactly_once(spark, stream_dirs):
    base, pages_dir, items = stream_dirs
    store = TableStore(os.path.join(base, "state2"))
    ckpt = os.path.join(base, "ckpt2")
    run_available_now(spark, pages_dir, store, items, ckpt)
    n1 = store.table("entries").read(spark).count()
    # re-run with the same checkpoint: nothing new to process
    run_available_now(spark, pages_dir, store, items, ckpt)
    n2 = store.table("entries").read(spark).count()
    assert n1 == n2 == N_PAGES


def test_windowed_counts_is_streaming_plan(spark, stream_dirs):
    _base, pages_dir, items = stream_dirs
    df = windowed_enclosure_counts(spark, pages_dir, items)
    assert df.isStreaming
    assert set(df.columns) == {"window", "provider", "count"}


def test_streaming_seen_filter_suppresses_cross_batch_repeats(spark):
    """applyInPandasWithState first-seen semantics: a url emitted in an
    earlier micro-batch must be suppressed in every later one (state
    survives across batches), and in-batch duplicates collapse to one."""
    import pandas as pd

    from pink_spider_spark.crawl.streaming import streaming_seen_filter
    from pink_spider_spark.functions.udfs import with_url_hash

    base = tempfile.mkdtemp(prefix="seen_stream_")
    src = os.path.join(base, "urls")
    os.makedirs(src)
    sink_dir = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")

    batch1 = ["http://h0.example.com/a", "http://h0.example.com/b",
              "http://h0.example.com/b", "http://h1.example.com/c"]
    batch2 = ["http://h0.example.com/a", "http://h1.example.com/c",
              "http://h1.example.com/d"]
    schema = "url string"
    spark.createDataFrame(pd.DataFrame({"url": batch1})) \
        .coalesce(1).write.parquet(os.path.join(src, "b1"))
    spark.createDataFrame(pd.DataFrame({"url": batch2})) \
        .coalesce(1).write.parquet(os.path.join(src, "b2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    out = streaming_seen_filter(with_url_hash(stream), n_shards=4)
    q = (out.writeStream.format("parquet")
         .option("path", sink_dir)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    emitted = [r.url for r in spark.read.parquet(sink_dir).collect()]
    # exactly the distinct urls, each once — no cross-batch re-emission
    assert sorted(emitted) == sorted({u for u in batch1 + batch2})
    shutil.rmtree(base, ignore_errors=True)


def test_stream_stream_interval_join_matches_batch(spark):
    """Watermarked stream-stream interval join == the equivalent static
    join (availableNow drain), and out-of-window pairs are excluded."""
    import datetime as dt

    import pandas as pd

    from pink_spider_spark.crawl.streaming import stream_interval_join

    base = tempfile.mkdtemp(prefix="ssj_")
    ldir, rdir = os.path.join(base, "l"), os.path.join(base, "r")
    sink, ckpt = os.path.join(base, "out"), os.path.join(base, "ck")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    fetches = pd.DataFrame({
        "url": ["u1", "u2", "u3"],
        "fetch_ts": [t0, t0 + dt.timedelta(minutes=5),
                     t0 + dt.timedelta(minutes=40)]})
    discov = pd.DataFrame({
        "url": ["u1", "u1", "u2", "u3"],
        "disc_ts": [t0 + dt.timedelta(minutes=3),       # in window
                    t0 + dt.timedelta(minutes=20),      # > 10 min: out
                    t0 + dt.timedelta(minutes=4),       # before fetch: out
                    t0 + dt.timedelta(minutes=45)]})    # in window
    spark.createDataFrame(fetches).coalesce(1).write.parquet(ldir)
    spark.createDataFrame(discov).coalesce(1).write.parquet(rdir)

    lstream = spark.readStream.schema("url string, fetch_ts timestamp") \
        .parquet(ldir)
    rstream = spark.readStream.schema("url string, disc_ts timestamp") \
        .parquet(rdir)
    q = (stream_interval_join(lstream, rstream, "url",
                              "fetch_ts", "disc_ts", max_lag_minutes=10)
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r.l_url, r.r_disc_ts) for r in spark.read.parquet(sink).collect()}
    assert got == {("u1", t0 + dt.timedelta(minutes=3)),
                   ("u3", t0 + dt.timedelta(minutes=45))}
    shutil.rmtree(base, ignore_errors=True)


def test_stream_session_rollup_batch_semantics(spark):
    import datetime as dt
    from pink_spider_spark.crawl.streaming import stream_session_rollup
    T = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    ev = spark.createDataFrame(
        [(1, T), (1, T + 10 * m), (1, T + 50 * m),   # gap 40m splits
         (2, T)], ["user_id", "ts"])
    out = {(r.user_id, r.session_start): r for r in
           stream_session_rollup(ev, gap="30 minutes").collect()}
    s1 = out[(1, T)]
    assert s1.n_events == 2
    # session_window end = last event + gap
    assert s1.session_end == T + 10 * m + 30 * m
    assert out[(1, T + 50 * m)].n_events == 1
    assert out[(2, T)].n_events == 1


def test_stream_session_rollup_is_streaming_and_emits(spark, tmp_path):
    import datetime as dt
    from pink_spider_spark.crawl.streaming import stream_session_rollup
    d = str(tmp_path / "ev")
    T = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    spark.createDataFrame(
        [(1, T), (1, T + 5 * m), (2, T + 90 * m)],
        ["user_id", "ts"]).write.parquet(d)
    stream = (spark.readStream
              .schema("user_id bigint, ts timestamp").parquet(d))
    agg = stream_session_rollup(stream, gap="30 minutes")
    assert agg.isStreaming
    q = (agg.writeStream.format("memory").queryName("sess_rollup")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.user_id, r.session_start): r.n_events
            for r in spark.sql("SELECT * FROM sess_rollup").collect()}
    assert rows[(1, T)] == 2
    assert rows[(2, T + 90 * m)] == 1
