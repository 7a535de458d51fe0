"""Feed sweep parity vs a sequential reference-semantics loop
(reference: src/rss_crawler.rs + src/model/feed.rs:210-232)."""

import pytest
from pyspark.sql import functions as F

from pink_spider_spark.crawl.feeds import crawl_feeds
from pink_spider_spark.crawl.rss import feed_entries_from_xml, parse_feed
from pink_spider_spark.extract import extract
from pink_spider_spark.providers import Catalog
from pink_spider_spark.sources.synth import (
    build_catalog_items,
    feed_entries_rows,
    feed_xml_rows,
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
    # the entries table is DERIVED from raw feed XML by the parse UDF
    # (reference: src/rss.rs:24-43), not taken from the synth rows —
    # test_xml_parse_reproduces_synth_rows pins the equivalence
    xml_df = spark.createDataFrame(feed_xml_rows(8, 10, N_PAGES))
    fe_df = feed_entries_from_xml(xml_df).cache()
    pages_local = gen_pages_local(N_PAGES, items)
    pages_map = dict(zip(pages_local.url, pages_local.html))
    return items, pages_df, feeds_df, fe_df, feeds_pdf, fe_pdf, pages_map


def test_xml_parse_reproduces_synth_rows(spark, feed_setup):
    """UDF-parsed XML == the synthetic feed_entries table, byte-for-byte
    (incl. null vs empty alternate links, 1970 published, ISO-8859-1
    encoded feeds)."""
    *_, fe_df, _feeds_pdf, fe_pdf, _pages = feed_setup
    got = {(r.feed_url, r.pos): r for r in fe_df.collect()}
    assert len(got) == len(fe_pdf)
    for _, e in fe_pdf.iterrows():
        r = got[(e.feed_url, e.pos)]
        assert r.origin_id == e.origin_id
        assert r.title == e.title
        assert r.summary == e.summary
        assert r.content == e.content
        assert r.author == e.author
        assert r.published == e.published.to_pydatetime()
        assert r.updated == e.updated.to_pydatetime()
        assert r.alternate_href == e.alternate_href
        assert r.alternate == e.alternate
        assert r.keywords == e.keywords
        assert r.enclosure == e.enclosure


def test_jsonb_read_path(spark, feed_setup):
    """The jsonb columns answer get_json_object / from_json queries
    (reference read path for entry.alternate/keywords/enclosure)."""
    *_, fe_df, _f, fe_pdf, _p = feed_setup
    got = (
        fe_df.filter(F.get_json_object("enclosure", "$[0].type").isNotNull())
        .select(
            F.get_json_object("alternate", "$[0].href").alias("href"),
            F.from_json("enclosure",
                        "array<struct<href:string,type:string,length:long>>")
            .getItem(0).alias("enc"))
        .collect())
    assert len(got) > 0
    for r in got:
        assert r.enc.type == "audio/mpeg"
        assert r.enc.length >= 1000
        assert r.href is None or r.href.startswith("https://")


def test_parse_feed_iso_8859_1_fallback():
    """Charset-driven latin-1 decode (reference: src/rss.rs:33-40)."""
    xml = ('<?xml version="1.0" encoding="iso-8859-1"?>'
           "<rss version=\"2.0\"><channel><title>Caf\xe9 feed</title>"
           "<item><guid>g1</guid><title>Entr\xe9e</title>"
           "<link>https://x.example/a</link></item>"
           "</channel></rss>").encode("iso-8859-1")
    parsed = parse_feed(xml, "iso-8859-1")
    assert parsed["meta"]["title"] == "Café feed"
    assert parsed["entries"][0]["title"] == "Entrée"
    # without the charset header the bytes are NOT valid utf-8: the
    # lossy decode mangles the accent but never crashes
    lossy = parse_feed(xml, None)
    assert lossy["entries"][0]["title"] != "Entrée"


def test_parse_feed_atom():
    xml = b"""<?xml version="1.0"?>
    <feed xmlns="http://www.w3.org/2005/Atom" xml:lang="en">
      <title>Atom feed</title><subtitle>sub</subtitle>
      <entry>
        <id>urn:a:1</id><title>First</title><summary>s1</summary>
        <author><name>alice</name></author>
        <published>2024-03-24T12:30:59Z</published>
        <updated>2024-03-25T01:00:00+09:00</updated>
        <link rel="self" href="https://x.example/self"/>
        <link rel="alternate" href="https://x.example/alt"/>
      </entry>
    </feed>"""
    import datetime
    parsed = parse_feed(xml)
    assert parsed["meta"]["title"] == "Atom feed"
    e = parsed["entries"][0]
    assert e["origin_id"] == "urn:a:1"
    assert e["alternate_href"] == "https://x.example/alt"
    assert e["author"] == "alice"
    assert e["published"] == datetime.datetime(2024, 3, 24, 12, 30, 59)
    assert e["updated"] == datetime.datetime(2024, 3, 24, 16, 0, 0)
    assert e["pos"] == 0


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


def test_update_feed_state(spark, feed_setup):
    """Feed velocity/state update path: swept feeds get velocity =
    entries-this-sweep and stay alive; a feed whose XML parses to nothing
    goes dead with velocity 0."""
    from pink_spider_spark.crawl.feeds import update_feed_state

    items, pages_df, feeds_df, fe_df, feeds_pdf, fe_pdf, pages_map = feed_setup
    # add one feed whose XML yields no entries (parse-failure analog)
    import pandas as pd
    broken = feeds_pdf.iloc[:1].copy()
    broken["url"] = "https://feeds.example.com/rss/broken.xml"
    all_feeds = spark.createDataFrame(pd.concat([feeds_pdf, broken]))
    out = crawl_feeds(spark, all_feeds, fe_df, pages_df, items)
    updated = {r.url: r for r in update_feed_state(
        all_feeds, fe_df, out["report"]).collect()}
    assert len(updated) == len(feeds_pdf) + 1
    dead = updated["https://feeds.example.com/rss/broken.xml"]
    assert dead.state == "dead" and dead.velocity == 0.0
    report = {r.feed_id: r.entries for r in out["report"].collect()}
    for url, r in updated.items():
        if url == dead.url:
            continue
        assert r.state == "alive"
        assert r.velocity == float(report.get(url, 0))
