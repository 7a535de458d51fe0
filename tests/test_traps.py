"""Crawler-trap mitigation: heuristic pins, Spark-vs-twin equality, and
enqueue-time filtering parity with the sequential simulator."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pink_spider_spark.crawl.traps import (
    MAX_PATH_DEPTH,
    filter_traps,
    is_trap_url,
    trap_col,
)

GOOD = [
    "https://h.example.com/a/b?x=1",
    "https://h.example.com/",
    "https://h.example.com/" + "/".join(f"s{i}" for i in range(MAX_PATH_DEPTH)),  # at limit
    "https://h.example.com/foo/foo/bar",            # only 2 repeats
    "https://h.example.com/p?a=1&b=2&c=3",
]
TRAPS = [
    "https://h.example.com/" + "a" * 2100,                        # too long
    "https://h.example.com/" + "/".join(f"s{i}" for i in range(MAX_PATH_DEPTH + 1)),
    "https://h.example.com/p?" + "&".join(f"k{i}=v" for i in range(9)),
    "https://h.example.com/foo/foo/foo/bar",        # 3 consecutive repeats
    "https://h.example.com/x/cal/cal/cal",
]


def test_twin_classification():
    assert [is_trap_url(u) for u in GOOD] == [False] * len(GOOD)
    assert [is_trap_url(u) for u in TRAPS] == [True] * len(TRAPS)


def test_spark_column_matches_twin(spark):
    df = spark.createDataFrame([(u,) for u in GOOD + TRAPS], ["url"])
    got = {r["url"]: r["trap"]
           for r in df.withColumn("trap", trap_col(F.col("url"))).collect()}
    for u in GOOD + TRAPS:
        assert got[u] == is_trap_url(u), u
    kept = {r["url"] for r in filter_traps(df).collect()}
    assert kept == set(GOOD)


@pytest.fixture(scope="module")
def trap_corpus(spark):
    """Tiny hand-built corpus where the seed links to a trap URL that has
    a stored page (it WOULD be crawled if not filtered)."""
    from pink_spider_spark.sources.synth import build_catalog_items

    items = build_catalog_items()
    trap_url = "https://hosta.example.com/foo/foo/foo/x"
    ok_url = "https://hosta.example.com/ok"
    seed = "https://hosta.example.com/p0"
    para = "Plain filler text, long enough to score as content. " * 3
    pages = {
        seed: (f'<html><body><p>{para}</p><a href="{trap_url}">t</a>'
               f'<a href="{ok_url}">ok</a></body></html>'),
        trap_url: f"<html><body><p>{para}</p></body></html>",
        ok_url: f"<html><body><p>{para}</p></body></html>",
    }
    pages_df = spark.createDataFrame(list(pages.items()), ["url", "html"])
    return items, pages, pages_df, seed, trap_url, ok_url


@pytest.mark.parametrize("flag", [True, False])
def test_crawl_trap_filter_parity(spark, trap_corpus, flag):
    from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
    from pink_spider_spark.crawl.simulator import simulate
    from pink_spider_spark.sources.tables import TableStore

    items, pages, pages_df, seed, trap_url, ok_url = trap_corpus
    robots_df = spark.createDataFrame(
        [("hosta.example.com", ["/private"], 16)],
        "host string, disallow_prefixes array<string>, max_per_wave int")
    root = tempfile.mkdtemp(prefix="trap_crawl_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages_df, robots_df, items,
                             CrawlConfig(max_depth=2, max_waves=5,
                                         trap_filter=flag))
        driver.run([seed])
        spark_seen = {(r["url"], r["first_wave"], r["seq"])
                      for r in store.table("seen").read(spark).collect()}
        sim = simulate(pages, {"hosta.example.com": {
            "disallow_prefixes": ["/private"], "max_per_wave": 16}},
            items, [seed], max_depth=2, max_waves=5, trap_filter=flag)
        assert spark_seen == set(sim.seen)
        urls = {u for (u, _, _) in spark_seen}
        assert ok_url in urls
        assert (trap_url in urls) == (not flag)
    finally:
        shutil.rmtree(root, ignore_errors=True)
