"""Structured Streaming ingestion: continuous extraction over arriving pages.

The reference is strictly batch (cron binaries; SURVEY.md §2.11) and the
north rule keeps the crawler batch ("each crawl wave is a Spark job").
This module covers the complementary capability a production pipeline
needs: when pages arrive CONTINUOUSLY (e.g. WARC drops landing in object
storage), run the same extraction operator as a stream —

    readStream(parquet dir) -> extract UDF (mapInPandas works unchanged on
    streaming DataFrames) -> foreachBatch sink appending to the same
    snapshot tables the batch engine reads

foreachBatch is the right sink here: each micro-batch commits through the
SnapshotTable manifest exactly like a wave does, so batch and streaming
ingestion share one storage contract and resume point.  Watermarking is
not needed for the stateless extract; the windowed-rollup helper shows the
watermark + tumbling-window shape for late-data metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import extract_pages
from ..sources.schemas import PAGES_SCHEMA
from ..sources.tables import TableStore


def stream_extract(spark: SparkSession, pages_dir: str, store: TableStore,
                   catalog_items: dict, checkpoint_dir: str,
                   max_files_per_trigger: int = 8):
    """Continuous extraction: pages parquet dir -> entries/enclosures
    appends per micro-batch.  Returns the StreamingQuery (caller awaits
    or stops it); use trigger(availableNow=True) semantics via
    ``run_available_now`` for drain-and-stop processing."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(pages_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        extracted = extract_pages(batch_df, catalog_items)
        entries = extracted.select(
            "url",
            F.col("og_title").alias("title"),
            F.col("og_description").alias("description"),
            F.col("og_image").alias("visual_url"),
            F.col("og_locale").alias("locale"),
            "content", "text", "enclosures", "links",
            F.lit(int(batch_id)).cast("int").alias("crawled_wave"),
        )
        _sid, d = store.table("entries").append_returning_dir(entries)
        staged = batch_df.sparkSession.read.parquet(d)
        enclosures = (
            staged.select("url", F.explode("enclosures").alias("e"))
            .select("url", "e.kind", "e.provider", "e.identifier",
                    "e.owner_id", "e.state", "e.in_catalog",
                    "e.doc_pos", "e.child_pos"))
        store.table("enclosures").append(enclosures)

    return (
        stream.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(spark: SparkSession, pages_dir: str, store: TableStore,
                      catalog_items: dict, checkpoint_dir: str) -> None:
    """Drain everything currently in pages_dir and stop (availableNow)."""
    q = stream_extract(spark, pages_dir, store, catalog_items, checkpoint_dir)
    q.awaitTermination()


def streaming_seen_filter(urls_stream: DataFrame, n_shards: int = 64):
    """Custom stateful streaming operator: first-seen URL filter.

    The streaming analog of the batch crawl-once / seen-set semantics
    (reference: src/model/entry.rs:295-308 find_or_create_by_url — an
    entry is processed the first time its URL appears, ever): URLs
    arrive continuously; each is emitted in the micro-batch where it
    FIRST appears and suppressed in every later micro-batch.  Built on
    ``applyInPandasWithState`` because no built-in streaming op holds
    cross-batch state keyed this way (dropDuplicates on an unbounded
    stream without a watermark would grow driverless state with no
    shard control).

    Scale shape: state is keyed by ``shard = url_hash % n_shards`` and
    holds the shard's seen-hash array, so the seen-set partitions across
    executors exactly like the batch engine's sharded bloom
    (crawl/bloom.py) — raise ``n_shards`` with cluster size.  Input must
    carry ``url`` and ``url_hash`` (use functions.udfs.with_url_hash).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField("url", StringType()),
        StructField("url_hash", LongType()),
    ])
    state_schema = StructType([
        StructField("seen", ArrayType(LongType())),
    ])

    def first_seen(key, pdf_iter, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            # batch-local first occurrence, in arrival order
            fresh = pdf[~pdf["url_hash"].isin(seen)]
            fresh = fresh.drop_duplicates(subset=["url_hash"], keep="first")
            seen.update(int(h) for h in fresh["url_hash"])
            if len(fresh):
                yield fresh[["url", "url_hash"]]
        state.update((list(seen),))

    shard = F.pmod(F.col("url_hash"), F.lit(n_shards)).alias("__shard")
    return (
        urls_stream.select("url", "url_hash", shard)
        .groupBy("__shard")
        .applyInPandasWithState(
            first_seen, out_schema, state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


def windowed_enclosure_counts(spark: SparkSession, pages_dir: str,
                              catalog_items: dict):
    """Streaming windowed rollup with a watermark: enclosures found per
    10-minute warc_ts window (late pages beyond 30 min dropped).  Returns
    the streaming DataFrame for the caller to sink."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        .withWatermark("warc_ts", "30 minutes")
    )
    extracted = extract_pages(stream, catalog_items,
                              passthrough_cols=["warc_ts"])
    return (
        extracted
        .select("warc_ts", F.explode("enclosures").alias("e"))
        .groupBy(F.window("warc_ts", "10 minutes"),
                 F.col("e.provider").alias("provider"))
        .count()
    )


def stream_interval_join(left, right, key: str, left_ts: str,
                         right_ts: str, max_lag_minutes: int = 10,
                         watermark: str = "30 minutes"):
    """Watermarked stream-stream interval join: pair each left event
    with right events of the same key whose event time falls in
    [left_ts, left_ts + max_lag] — in crawl terms, attribute discovered
    links (right) to the fetch that produced them (left) without ever
    materializing either side.

    Both inputs carry event-time watermarks and the join condition
    bounds right_ts relative to left_ts, which is exactly what
    Structured Streaming needs to EVICT buffered state: a row is held
    only until the opposite watermark passes its match window, so state
    is O(rate × lag), not O(stream).  Output columns are prefixed
    ``l_``/``r_`` (stream-stream joins forbid post-join renames of the
    time columns)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
           + F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")))
    joined = l.join(r, cond, "inner")
    out = [F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns]
    out += [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns
            if c != key]
    return joined.select(*out)


def stream_session_rollup(events, user_col: str = "user_id",
                          ts_col: str = "ts", gap: str = "30 minutes",
                          watermark: str = "1 hour"):
    """Streaming sessionization with native session windows
    (F.session_window, the Structured Streaming twin of the batch
    ``user_sessions`` query): events of one user belong to the same
    session while gaps stay under ``gap``; the window closes — and the
    row becomes FINAL, emittable in append mode — once the watermark
    passes session end + gap.  State per live (user, session) is one
    merging window, evicted at close: O(active users), not O(stream).

    Returns the streaming aggregate (user, session_start, session_end,
    n_events) for the caller to sink.  The same expression works on a
    batch frame, which is how the unit pins batch/stream equality."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col),
                     F.session_window(F.col(ts_col), gap))
            .agg(F.count("*").cast("long").alias("n_events"))
            .select(user_col,
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events"))
