"""Feed sweep parity vs a sequential reference-semantics loop
(reference: src/rss_crawler.rs + src/model/feed.rs:210-232)."""

import pytest
from pyspark.sql import functions as F

from pink_spider_spark.crawl.feeds import crawl_feeds
from pink_spider_spark.extract import extract
from pink_spider_spark.providers import Catalog
from pink_spider_spark.sources.synth import (
    build_catalog_items,
    feed_entries_rows,
    feeds_rows,
    gen_pages_local,
    gen_pages_spark,
)

N_PAGES = 150


@pytest.fixture(scope="module")
def feed_setup(spark):
    items = build_catalog_items()
    pages_df = gen_pages_spark(spark, N_PAGES, items).cache()
    pages_df.count()
    feeds_pdf = feeds_rows(8)
    fe_pdf = feed_entries_rows(8, 10, N_PAGES)
    feeds_df = spark.createDataFrame(feeds_pdf)
    fe_df = spark.createDataFrame(fe_pdf)
    pages_local = gen_pages_local(N_PAGES, items)
    pages_map = dict(zip(pages_local.url, pages_local.html))
    return items, pages_df, feeds_df, fe_df, feeds_pdf, fe_pdf, pages_map


def _sequential_sweep(items, feeds_pdf, fe_pdf, pages_map):
    """Plain-python mirror of Feed::crawl over every feed."""
    catalog = Catalog(items)
    feeds_sorted = feeds_pdf.sort_values(
        ["last_updated", "url"], ascending=[False, True])
    seen = {}
    for _, feed in feeds_sorted.iterrows():
        fe = fe_pdf[fe_pdf.feed_url == feed.url].sort_values("pos")
        for _, e in fe.iterrows():
            alt = e.alternate_href
            if alt is None or alt == "":
                continue  # feed.rs:214-217
            if alt in seen:
                continue  # find_or_create: already created this sweep
            html = pages_map.get(alt)
            product = extract(html, alt, catalog) if html is not None else None
            og = product.og if product else {"images": []}
            title = e.title.strip()
            seen[alt] = {
                "feed_id": e.feed_url,
                "title": title if title else og.get("title"),
                "description": og.get("description"),
                "locale": og.get("locale"),
                "text": product.text if product else None,
                "origin_id": e.origin_id if e.origin_id else alt,
                "tracks": {(t["provider"], t["identifier"])
                           for t in (product.tracks if product else [])},
            }
    return seen


def test_feed_sweep_parity(spark, feed_setup):
    items, pages_df, feeds_df, fe_df, feeds_pdf, fe_pdf, pages_map = feed_setup
    out = crawl_feeds(spark, feeds_df, fe_df, pages_df, items)
    got = {r.url: r for r in out["entries"].collect()}
    expected = _sequential_sweep(items, feeds_pdf, fe_pdf, pages_map)
    assert set(got) == set(expected)
    for url, exp in expected.items():
        row = got[url]
        assert row.feed_id == exp["feed_id"], url
        assert row.title == exp["title"], url
        assert row.description == exp["description"], url
        assert row.text == exp["text"], url
        assert row.origin_id == exp["origin_id"], url
    # enclosure parity per entry
    enc = out["enclosures"].filter(F.col("kind") == "track").collect()
    got_tracks = {}
    for r in enc:
        got_tracks.setdefault(r.url, set()).add((r.provider, r.identifier))
    for url, exp in expected.items():
        assert got_tracks.get(url, set()) == exp["tracks"], url


def test_feed_sweep_crawl_once(spark, feed_setup):
    """URLs with an existing VALID entry are skipped; invalid ones redone
    (reference: src/model/entry.rs:295-308)."""
    items, pages_df, feeds_df, fe_df, *_ = feed_setup
    first = crawl_feeds(spark, feeds_df, fe_df, pages_df, items)
    existing = first["entries"]
    # all produced entries have feed_id set; valid ones = published >= 1000s
    second = crawl_feeds(spark, feeds_df, fe_df, pages_df, items,
                         existing_entries=existing)
    first_urls = {r.url for r in existing.select("url").collect()}
    second_urls = {r.url for r in second["entries"].select("url").collect()}
    # the re-sweep only reprocesses invalid entries (epoch published)
    invalid = {r.url for r in existing.filter(
        F.col("published").cast("long") < 1000).select("url").collect()}
    assert second_urls == invalid
    assert second_urls.issubset(first_urls)
