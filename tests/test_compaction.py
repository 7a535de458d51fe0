"""Table maintenance (bin-pack compaction) under the crawl driver:
compaction between waves must preserve data, re-pin the checkpoint, and
leave resume semantics intact (the resumed crawl still matches the
sequential simulator's full trace)."""

import shutil
import tempfile

import pytest

from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
from pink_spider_spark.crawl.simulator import simulate
from pink_spider_spark.sources.synth import (
    build_catalog_items,
    gen_pages_local,
    gen_pages_spark,
    robots_rows,
    seed_urls,
)
from pink_spider_spark.sources.tables import TableStore

N_PAGES, N_SEEDS, DEPTH = 80, 5, 2


@pytest.fixture(scope="module")
def corpus(spark):
    items = build_catalog_items()
    pages_df = gen_pages_spark(spark, N_PAGES, items).cache()
    pages_df.count()
    robots_pdf = robots_rows()
    robots_df = spark.createDataFrame(robots_pdf)
    pages_local = gen_pages_local(N_PAGES, items)
    robots_map = {
        r["host"]: {"disallow_prefixes": list(r["disallow_prefixes"]),
                    "max_per_wave": int(r["max_per_wave"])}
        for _, r in robots_pdf.iterrows()
    }
    return items, pages_df, robots_df, dict(zip(pages_local.url,
                                                pages_local.html)), robots_map


def test_compact_then_resume_matches_simulator(spark, corpus):
    items, pages_df, robots_df, pages_map, robots_map = corpus
    root = tempfile.mkdtemp(prefix="compact_crawl_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages_df, robots_df, items,
                             CrawlConfig(max_depth=DEPTH, max_waves=3))
        driver.run(seed_urls(N_SEEDS))

        seen_t = store.table("seen")
        rows_before = {(r["url"], r["first_wave"], r["seq"])
                       for r in seen_t.read(spark).collect()}
        dirs_before = len(seen_t.snapshot_dirs())
        assert dirs_before >= 3  # one append per wave

        compacted = driver.maintain(min_dirs=2)
        assert "seen" in compacted
        assert len(seen_t.snapshot_dirs()) < dirs_before
        assert {(r["url"], r["first_wave"], r["seq"])
                for r in seen_t.read(spark).collect()} == rows_before
        # checkpoint re-pinned on the compacted snapshot
        assert store.read_checkpoint()["snapshots"]["seen"] == compacted["seen"]

        # resume on the compacted state: appends build on packed dirs
        driver2 = CrawlDriver(spark, store, pages_df, robots_df, items,
                              CrawlConfig(max_depth=DEPTH, max_waves=20))
        driver2.run(resume=True)
        spark_seen = {(r["url"], r["first_wave"], r["seq"])
                      for r in seen_t.read(spark).collect()}

        sim = simulate(pages_map, robots_map, items, seed_urls(N_SEEDS),
                       max_depth=DEPTH, max_waves=23)
        assert spark_seen == set(sim.seen)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compact_every_in_run_loop(spark, corpus):
    """compact_every wiring: the run loop invokes maintain without
    disturbing wave stats or final state."""
    items, pages_df, robots_df, pages_map, robots_map = corpus
    root = tempfile.mkdtemp(prefix="compact_loop_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages_df, robots_df, items,
                             CrawlConfig(max_depth=1, max_waves=10,
                                         compact_every=2))
        driver.run(seed_urls(N_SEEDS))
        sim = simulate(pages_map, robots_map, items, seed_urls(N_SEEDS),
                       max_depth=1, max_waves=10)
        spark_seen = {(r["url"], r["first_wave"], r["seq"])
                      for r in store.table("seen").read(spark).collect()}
        assert spark_seen == set(sim.seen)
    finally:
        shutil.rmtree(root, ignore_errors=True)
