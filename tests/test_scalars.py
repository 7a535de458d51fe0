"""F9/F10/F11 scalar functions pinned to the reference's formats.

- RFC3339 -> naive UTC (reference: src/model/track.rs:408-411)
- SoundCloud "%Y/%m/%d %H:%M:%S %z" (reference: src/model/track.rs:454-457)
- epoch seconds (reference: src/model/entry.rs:109,184-186)
- {w}/{h} artwork substitution 300/640 (reference: src/apple_music.rs:16-17,56-67)
- YouTube thumbnail fallback chains (reference: src/youtube.rs:22-40)
"""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from pink_spider_spark.functions import scalars as SC


def _one(spark, col, **row):
    return spark.createDataFrame([Row(**row)]).select(col.alias("v")).first().v


def test_parse_rfc3339(spark):
    assert _one(spark, SC.parse_rfc3339(F.col("s")), s="2013-03-24T12:30:59Z") \
        == datetime.datetime(2013, 3, 24, 12, 30, 59)
    # offset normalizes to UTC like chrono's naive_utc()
    assert _one(spark, SC.parse_rfc3339(F.col("s")),
                s="2013-03-24T12:30:59+09:00") \
        == datetime.datetime(2013, 3, 24, 3, 30, 59)
    # fractional seconds accepted
    assert _one(spark, SC.parse_rfc3339(F.col("s")),
                s="2013-03-24T12:30:59.500Z") \
        == datetime.datetime(2013, 3, 24, 12, 30, 59, 500000)
    # parse failure -> NULL (reference: Err(_) => () keeps old value)
    assert _one(spark, SC.parse_rfc3339(F.col("s")), s="not a date") is None


def test_parse_soundcloud(spark):
    assert _one(spark, SC.parse_soundcloud_ts(F.col("s")),
                s="2013/03/24 12:30:59 +0000") \
        == datetime.datetime(2013, 3, 24, 12, 30, 59)
    assert _one(spark, SC.parse_soundcloud_ts(F.col("s")),
                s="2013/03/24 12:30:59 +0900") \
        == datetime.datetime(2013, 3, 24, 3, 30, 59)
    assert _one(spark, SC.parse_soundcloud_ts(F.col("s")),
                s="2013-03-24T12:30:59Z") is None


def test_parse_epoch_seconds(spark):
    assert _one(spark, SC.parse_epoch_seconds(F.col("s")), s="1395664259") \
        == datetime.datetime(2014, 3, 24, 12, 30, 59)
    assert _one(spark, SC.parse_epoch_seconds(F.lit(0)), s="x") \
        == datetime.datetime(1970, 1, 1)


def test_artwork_sized(spark):
    t = "https://is1.example/image/thumb/Music/v4/ab/{w}x{h}bb.jpg"
    assert _one(spark, SC.artwork_sized(F.col("s"), SC.AM_THUMBNAIL_SIZE),
                s=t) == "https://is1.example/image/thumb/Music/v4/ab/300x300bb.jpg"
    assert _one(spark, SC.artwork_sized(F.col("s"), SC.AM_ARTWORK_SIZE),
                s=t) == "https://is1.example/image/thumb/Music/v4/ab/640x640bb.jpg"


def test_yt_thumbnail_chains(spark):
    full = {k: f"u_{k}" for k in SC.YT_THUMBNAIL_ORDER}
    assert _one(spark, SC.yt_thumbnail_url(F.col("m")), m=full) == "u_default"
    assert _one(spark, SC.yt_artwork_url(F.col("m")), m=full) == "u_maxres"
    partial = {"high": "u_high", "standard": "u_standard"}
    assert _one(spark, SC.yt_thumbnail_url(F.col("m")), m=partial) == "u_high"
    assert _one(spark, SC.yt_artwork_url(F.col("m")), m=partial) == "u_standard"
    empty = spark.createDataFrame([({},)], "m map<string,string>")
    assert empty.select(SC.yt_thumbnail_url(F.col("m")).alias("v")).first().v \
        is None


def test_enrich_catalog_end_to_end(spark):
    from pink_spider_spark.sources.synth import build_catalog_items, catalog_df

    cat = catalog_df(spark, build_catalog_items()).collect()
    by_key = {(r.provider, r.kind, r.identifier): r for r in cat}
    yt0 = by_key[("YouTube", "track", "ytt0")]
    # k=0: default present -> thumbnail=default, maxres present -> artwork
    assert yt0.thumbnail_url.endswith("/ytt0/default.jpg")
    assert yt0.artwork_url.endswith("/ytt0/maxres.jpg")
    yt1 = by_key[("YouTube", "track", "ytt1")]  # k=1: only high
    assert yt1.thumbnail_url.endswith("/ytt1/high.jpg")
    assert yt1.artwork_url.endswith("/ytt1/high.jpg")
    am0 = by_key[("AppleMusic", "track", "amt0")]
    assert am0.thumbnail_url.endswith("/amt0/300x300bb.jpg")
    assert am0.artwork_url.endswith("/amt0/640x640bb.jpg")
    # all four providers agree on the derived UTC instant (k=2 uses the
    # +09:00 / +0900 offset variants)
    epoch = datetime.datetime(2024, 1, 1)
    idents = {"YouTube": "ytt", "SoundCloud": "sct",
              "Spotify": "spt", "AppleMusic": "amt"}
    for k in (0, 2, 5):
        for prov, stem in idents.items():
            r = by_key[(prov, "track", f"{stem}{k}")]
            assert r.published_at == epoch + datetime.timedelta(hours=k), \
                (prov, k, r.published_at)
