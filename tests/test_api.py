"""REST query-surface tests over engine tables produced by a real crawl."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pink_spider_spark import api
from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
from pink_spider_spark.sources.synth import (
    build_catalog_items,
    gen_pages_spark,
    robots_rows,
    seed_urls,
)
from pink_spider_spark.sources.tables import TableStore


@pytest.fixture(scope="module")
def crawled(spark):
    items = build_catalog_items()
    pages = gen_pages_spark(spark, 100, items).cache()
    robots = spark.createDataFrame(robots_rows())
    root = tempfile.mkdtemp(prefix="api_test_")
    store = TableStore(root)
    driver = CrawlDriver(spark, store, pages, robots, items,
                         CrawlConfig(max_depth=1, max_waves=3))
    driver.run(seed_urls(10))
    yield store, items
    shutil.rmtree(root, ignore_errors=True)


def test_index_pagination_and_search(spark, crawled):
    store, _ = crawled
    entries = store.table("entries").read(spark)
    p0 = api.index(entries, page=0, per_page=5, order_col="crawled_wave")
    rows = p0.collect()
    assert len(rows) == 5
    assert [r.page_index for r in rows] == [1, 2, 3, 4, 5]
    total = api.total_count(entries)
    assert total == entries.count()
    searched = api.index(entries, query="synth page 1", search_col="title",
                         order_col="crawled_wave")
    assert all("Synth Page 1" in r.title for r in searched.collect())


def test_show_and_mget(spark, crawled):
    store, items = crawled
    tracks = store.table("tracks").read(spark)
    some = tracks.limit(3).collect()
    one = api.show_by_provider_and_identifier(
        tracks, some[0].provider, some[0].identifier).collect()
    assert len(one) == 1 and one[0].identifier == some[0].identifier
    got = api.mget(tracks, [(r.provider, r.identifier) for r in some])
    assert got.count() == 3


def test_entry_hydration_nested_lists(spark, crawled):
    store, items = crawled
    entries = store.table("entries").read(spark).drop("enclosures", "links")
    enclosures = store.table("enclosures").read(spark)
    dims = {p: store.table(p).read(spark)
            for p in ("tracks", "playlists", "albums")}
    hydrated = api.entry_with_enclosures(entries, enclosures, dims)
    rows = hydrated.collect()
    assert {r.url for r in rows} == {r.url for r in entries.collect()}
    # nested lists match the flat link table, enriched with dim titles
    flat = {}
    for r in enclosures.collect():
        flat.setdefault((r.url, r.kind), set()).add((r.provider, r.identifier))
    for r in rows:
        for kind, plural in (("track", "tracks"), ("playlist", "playlists"),
                             ("album", "albums")):
            nested = {(e.provider, e.identifier) for e in getattr(r, plural)}
            assert nested == flat.get((r.url, kind), set()), (r.url, kind)
            for e in getattr(r, plural):
                if (e.provider, "track" if kind == "track" else kind,
                        e.identifier) in items:
                    assert e.title is not None


def test_playlistify_lookup_cache_hit(spark, crawled):
    store, _ = crawled
    entries = store.table("entries").read(spark)
    url = entries.first().url
    hit = api.playlistify_lookup(entries, url).collect()
    assert len(hit) == 1 and hit[0].url == url


def test_json_serialization_roundtrip(spark):
    """S14: REST responses are one to_json(struct(*)) away
    (reference: src/main.rs:65-66,127-128); round-trips through
    from_json losslessly."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("YouTube", "ytt1", "Track 1", 120, ["a", "b"]),
         ("Spotify", "spt2", 'quo"te', 0, [])],
        "provider string, identifier string, title string, "
        "duration int, tags array<string>")
    ser = df.select(F.to_json(F.struct(*df.columns)).alias("j"))
    back = ser.select(F.from_json(
        "j", df.schema).alias("s")).select("s.*")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    j = ser.orderBy("j").first().j
    assert j.startswith('{"provider":')
