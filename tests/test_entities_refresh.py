"""Batch refresh loop tests (reference: update_tracks/playlist_crawler/
update_artists semantics re-expressed relationally)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pink_spider_spark.crawl import entities
from pink_spider_spark.sources import schemas
from pink_spider_spark.sources.synth import build_catalog_items
from pink_spider_spark.sources.synth import catalog_df as _build_catalog_df


def _dim_df(spark, rows):
    return spark.createDataFrame(rows, schemas.ENCLOSURE_DIM_SCHEMA)


@pytest.fixture(scope="module")
def catalog_df(spark):
    return _build_catalog_df(spark, build_catalog_items()).cache()


def _dim_row(provider, identifier, owner_id=None, state="alive", title=None,
             velocity=0.0, first_wave=1):
    return Row(provider=provider, identifier=identifier,
               title=title or identifier, owner_id=owner_id,
               owner_name=None, provider_url=None, thumbnail_url=None,
               artwork_url=None, duration=0, published_at=None,
               state=state, velocity=velocity, first_wave=first_wave)


def test_refresh_stale_dims(spark, catalog_df):
    dim = _dim_df(spark, [
        _dim_row("YouTube", "ytt0"),              # stale, in catalog
        _dim_row("YouTube", "gone0"),             # stale, NOT in catalog
        _dim_row("YouTube", "ytt1", owner_id="already"),  # not stale
        _dim_row("YouTube", "deadone", state="dead"),     # not stale (dead)
    ])
    out = {r.identifier: r for r in entities.refresh_stale_dims(
        dim, catalog_df, "track", wave=2).collect()}
    assert len(out) == 4
    assert out["ytt0"].owner_id is not None and out["ytt0"].state == "alive"
    assert out["ytt0"].title == "YouTube track 0"
    assert out["gone0"].state == "dead"          # disable path
    assert out["ytt1"].owner_id == "already"     # untouched
    assert out["deadone"].state == "dead"        # untouched


def test_refresh_active_playlists_upsert(spark, catalog_df):
    playlists = spark.createDataFrame([
        Row(provider="YouTube", identifier="ytp0"),
        Row(provider="YouTube", identifier="unknownpl"),
    ])
    existing = spark.createDataFrame([
        # stale membership row that the re-fetch replaces
        Row(provider="YouTube", playlist_identifier="ytp0", pos=99,
            track_identifier="ytt0", first_wave=1),
        # row for a playlist not being refreshed: kept
        Row(provider="Spotify", playlist_identifier="spp0", pos=0,
            track_identifier="spt0", first_wave=1),
    ])
    out = entities.refresh_active_playlists(
        playlists, existing, catalog_df, wave=3).collect()
    items = build_catalog_items()
    expected_children = items[("YouTube", "playlist", "ytp0")]["child_identifiers"]
    ytp0 = sorted([(r.pos, r.track_identifier, r.first_wave)
                   for r in out if r.playlist_identifier == "ytp0"])
    assert [t for (_p, t, _w) in ytp0] == list(expected_children)
    # refreshed pair got the new wave + catalog pos, not the stale pos=99
    assert all(w == 3 for (_p, _t, w) in ytp0)
    kept = [r for r in out if r.playlist_identifier == "spp0"]
    assert len(kept) == 1 and kept[0].first_wave == 1


def test_driver_run_refresh_end_to_end(spark, catalog_df):
    """Crawl a small corpus then run the refresh pass; artists and
    track_artists materialize, refreshed dims stay key-complete."""
    import shutil
    import tempfile

    from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
    from pink_spider_spark.sources.synth import (build_catalog_items,
                                                 gen_pages_spark, robots_rows,
                                                 seed_urls)
    from pink_spider_spark.sources.tables import TableStore

    items = build_catalog_items()
    pages = gen_pages_spark(spark, 80, items)
    robots = spark.createDataFrame(robots_rows())
    root = tempfile.mkdtemp(prefix="refresh_e2e_")
    try:
        store = TableStore(root)
        driver = CrawlDriver(spark, store, pages, robots, items,
                             CrawlConfig(max_depth=1, max_waves=3))
        driver.run(seed_urls(8))
        before = {(r.provider, r.identifier)
                  for r in store.table("tracks").read(spark).collect()}
        driver.run_refresh()
        after_rows = store.table("tracks").read(spark).collect()
        after = {(r.provider, r.identifier) for r in after_rows}
        assert after == before  # refresh never loses/creates keys
        # every in-catalog track now has its owner populated
        for r in after_rows:
            if (r.provider, "track", r.identifier) in items:
                assert r.owner_id is not None
        artists = store.table("artists").read(spark).collect()
        ta = store.table("track_artists").read(spark).collect()
        assert len(artists) > 0 and len(ta) >= len(artists)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_artist_rows(spark, catalog_df):
    tracks = _dim_df(spark, [
        _dim_row("YouTube", "t1", owner_id="chan1"),
        _dim_row("YouTube", "t2", owner_id="chan1"),
        _dim_row("YouTube", "t3", owner_id="chan2"),
        _dim_row("YouTube", "t4"),  # no owner -> no artist
    ])
    artists, track_artists = entities.artist_rows(tracks, catalog_df, wave=1)
    a = {(r.provider, r.identifier) for r in artists.collect()}
    assert a == {("YouTube", "chan1"), ("YouTube", "chan2")}
    ta = {(r.track_identifier, r.artist_identifier)
          for r in track_artists.collect()}
    assert ta == {("t1", "chan1"), ("t2", "chan1"), ("t3", "chan2")}


def test_find_actives_velocity_and_order(spark, catalog_df):
    """find_actives: velocity>0 filter + updated ASC ordering (reference:
    src/model/playlist.rs:263-270).  Inactive playlists are skipped by the
    default refresh path."""
    playlists = _dim_df(spark, [
        _dim_row("YouTube", "ytp0", velocity=3.0, first_wave=5),
        _dim_row("YouTube", "ytp1", velocity=0.0, first_wave=1),  # inactive
        _dim_row("SoundCloud", "scp0", velocity=1.0, first_wave=2),
        _dim_row("Spotify", "spp0", velocity=2.0, first_wave=2),
    ])
    actives = entities.find_actives(playlists).collect()
    assert [(r.provider, r.identifier) for r in
            sorted(actives, key=lambda r: r.active_rank)] == [
        ("SoundCloud", "scp0"), ("Spotify", "spp0"), ("YouTube", "ytp0")]
    assert all(r.identifier != "ytp1" for r in actives)

    # default refresh path consumes the dim's velocity column: the
    # inactive ytp1 keeps its stale membership, active ytp0 is refreshed
    existing = spark.createDataFrame([
        Row(provider="YouTube", playlist_identifier="ytp0", pos=99,
            track_identifier="stale0", first_wave=1),
        Row(provider="YouTube", playlist_identifier="ytp1", pos=42,
            track_identifier="stale1", first_wave=1),
    ])
    out = entities.refresh_active_playlists(
        playlists, existing, catalog_df, wave=7).collect()
    ytp0 = {(r.track_identifier, r.first_wave)
            for r in out if r.playlist_identifier == "ytp0"}
    ytp1 = [(r.pos, r.track_identifier)
            for r in out if r.playlist_identifier == "ytp1"]
    # active: catalog membership upserted at wave 7; the stale non-member
    # row survives (ON CONFLICT DO UPDATE never deletes,
    # src/model/playlist_track.rs:72-90)
    fresh = {t for (t, w) in ytp0 if w == 7}
    assert fresh == {"ytt0", "ytt1", "ytt2"}
    assert ("stale0", 1) in ytp0
    assert ytp1 == [(42, "stale1")]  # inactive: untouched


def test_update_playlist_velocity(spark):
    playlists = _dim_df(spark, [
        _dim_row("YouTube", "ytp0"),
        _dim_row("YouTube", "ytp1"),
    ])
    pt = spark.createDataFrame([
        Row(provider="YouTube", playlist_identifier="ytp0", pos=0,
            track_identifier="a", first_wave=3),
        Row(provider="YouTube", playlist_identifier="ytp0", pos=1,
            track_identifier="b", first_wave=3),
        Row(provider="YouTube", playlist_identifier="ytp1", pos=0,
            track_identifier="c", first_wave=1),  # older than since_wave
    ])
    out = {r.identifier: r.velocity
           for r in entities.update_playlist_velocity(
               playlists, pt, since_wave=2).collect()}
    assert out == {"ytp0": 2.0, "ytp1": 0.0}


def test_am_artist_search_match(spark, catalog_df):
    """Apple Music artist search-match branches (reference:
    src/update_artists.rs:47-69): single-result unconditional take,
    multi-result case-insensitive name pick, no-exact-match skip,
    no-result skip; non-AM providers untouched."""
    artists = spark.createDataFrame([
        Row(provider="AppleMusic", identifier="owner_applemusic_0",
            name="Owner AppleMusic 0", first_wave=1),
        Row(provider="AppleMusic", identifier="owner_applemusic_1",
            name="Owner AppleMusic 1", first_wave=1),
        Row(provider="AppleMusic", identifier="owner_applemusic_2",
            name="Owner AppleMusic 2", first_wave=1),
        Row(provider="AppleMusic", identifier="owner_applemusic_3",
            name="Owner AppleMusic 3", first_wave=1),
        Row(provider="YouTube", identifier="chan1",
            name="Owner YouTube 1", first_wave=1),
    ])
    out = {r.identifier: r for r in entities.am_artist_search_match(
        artists, catalog_df).collect()}
    assert len(out) == 5
    # no search result -> unchanged
    assert out["owner_applemusic_0"].am_catalog_id is None
    assert out["owner_applemusic_0"].name == "Owner AppleMusic 0"
    # exactly one result -> taken even though the name differs (:52-55)
    assert out["owner_applemusic_1"].am_catalog_id == "amar1"
    assert out["owner_applemusic_1"].name == "Owner Applemusic Uno"
    # two results -> the case-insensitive exact name wins (:57-63)
    assert out["owner_applemusic_2"].am_catalog_id == "amar2"
    assert out["owner_applemusic_2"].name == "Owner AppleMusic 2"
    # two results, none exact -> "Not updated"
    assert out["owner_applemusic_3"].am_catalog_id is None
    # other providers bypass the AM search entirely
    assert out["chan1"].am_catalog_id is None
