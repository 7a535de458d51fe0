"""Sitemap ingestion: XML parse pins, index resolution, and frontier
bootstrap from a sitemap-derived seed DataFrame."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pink_spider_spark.crawl.sitemaps import (
    parse_sitemap_xml,
    sitemap_entries,
    sitemap_seed_urls,
)
from pink_spider_spark.sources.synth import (
    host_of,
    page_url,
    sitemap_xml_bodies,
)

URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://h/a</loc><lastmod>2024-01-02</lastmod></url>"
    "<url><loc> https://h/b </loc></url>"
    "<url><lastmod>2024-01-03</lastmod></url>"  # no loc: dropped
    "</urlset>"
)


# ------------------------------------------------------------ pure parse
def test_urlset_parse_locs_and_lastmod():
    assert parse_sitemap_xml(URLSET) == [
        ("url", "https://h/a", "2024-01-02"),
        ("url", "https://h/b", None),
    ]


def test_sitemapindex_parse():
    body = (
        "<sitemapindex><sitemap><loc>https://h/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://h/s2.xml</loc></sitemap></sitemapindex>"
    )
    assert parse_sitemap_xml(body) == [
        ("sitemap", "https://h/s1.xml", None),
        ("sitemap", "https://h/s2.xml", None),
    ]


def test_no_namespace_and_bytes_ok():
    assert parse_sitemap_xml(b"<urlset><url><loc>x</loc></url></urlset>") == [
        ("url", "x", None)]


def test_malformed_and_foreign_xml_empty():
    assert parse_sitemap_xml("<urlset><url>") == []
    assert parse_sitemap_xml("<rss></rss>") == []
    assert parse_sitemap_xml(None) == []


# ------------------------------------------------------------ spark
N_PAGES = 60


@pytest.fixture(scope="module")
def bodies(spark):
    return spark.createDataFrame(sitemap_xml_bodies(N_PAGES)).cache()


def test_entries_explode(spark, bodies):
    ent = sitemap_entries(bodies)
    kinds = {r["kind"] for r in ent.select("kind").distinct().collect()}
    assert kinds == {"url", "sitemap"}
    # index rows come only from host0's root sitemap
    idx = ent.filter(F.col("kind") == "sitemap").collect()
    assert len(idx) == 2 and all("host0" in r["loc"] for r in idx)


def test_seed_urls_resolve_index_to_all_pages(spark, bodies):
    got = {r["url"] for r in sitemap_seed_urls(bodies).collect()}
    assert got == {page_url(i) for i in range(N_PAGES)}


def test_roots_restriction(spark, bodies):
    """Starting only from host0's root sitemap reaches exactly host0's
    pages (via the index), nothing else."""
    host0_root = bodies.filter(F.col("host") == "host0.example.com") \
                       .filter(F.col("url").endswith("/sitemap.xml")) \
                       .select("url")
    got = {r["url"] for r in sitemap_seed_urls(bodies, roots=host0_root).collect()}
    assert got == {page_url(i) for i in range(N_PAGES) if host_of(i) == 0}
    assert got  # non-empty


def test_bootstrap_from_sitemap_frame(spark, bodies):
    """The sitemap seed frame plugs into CrawlDriver.bootstrap unchanged
    (DataFrame form: nothing materializes on the driver)."""
    from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
    from pink_spider_spark.sources.synth import (
        build_catalog_items, gen_pages_spark, robots_rows)
    from pink_spider_spark.sources.tables import TableStore

    items = build_catalog_items()
    pages_df = gen_pages_spark(spark, N_PAGES, items)
    robots_df = spark.createDataFrame(robots_rows())
    root = tempfile.mkdtemp(prefix="sitemap_seed_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages_df, robots_df, items,
                             CrawlConfig(max_depth=0, max_waves=1))
        driver.bootstrap(sitemap_seed_urls(bodies))
        frontier = store.table("frontier").read(spark)
        assert frontier.count() == N_PAGES
        assert {r["status"] for r in
                frontier.select("status").distinct().collect()} == {"pending"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_roots_from_robots_pipeline(spark, bodies):
    """Full discovery path: robots.txt bytes -> advertised sitemaps ->
    resolved page URLs, all relational."""
    from pink_spider_spark.crawl.robots import robots_table_from_bodies
    from pink_spider_spark.crawl.sitemaps import roots_from_robots
    from pink_spider_spark.sources.synth import robots_txt_bodies

    robots = robots_table_from_bodies(
        spark.createDataFrame(robots_txt_bodies()))
    got = {r["url"] for r in
           sitemap_seed_urls(bodies, roots=roots_from_robots(robots)).collect()}
    expected = {page_url(i) for i in range(N_PAGES) if host_of(i) % 3 == 2}
    assert got == expected
    assert got
