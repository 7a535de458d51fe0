"""Provider scalar functions: date parsing + artwork/thumbnail transforms.

SURVEY.md §2.8 F9/F10/F11 as JVM column expressions (no UDFs):

- F11 date parsing, all three reference formats, parse-failure -> NULL
  (the reference leaves the previous value on Err, which relationally is
  ``coalesce(parsed, old)``):
  - RFC3339 (reference: src/model/track.rs:408-411
    ``DateTime::parse_from_rfc3339(..).naive_utc()``)
  - SoundCloud ``"%Y/%m/%d %H:%M:%S %z"`` (reference:
    src/model/track.rs:454-457)
  - epoch seconds (reference: src/model/entry.rs:109,184-186
    ``NaiveDateTime::from_timestamp``)
- F9 Apple Music artwork sizing: ``{w}``/``{h}`` substitution with
  300 (thumbnail) / 640 (artwork) (reference: src/apple_music.rs:16-17,
  56-67)
- F10 YouTube thumbnail fallback chains: default->medium->high->
  standard->maxres for thumbnails and the reverse for artwork
  (reference: src/youtube.rs:22-40)

``enrich_catalog`` applies them to a RAW provider-API-shaped catalog
frame, mirroring the reference's update_with_* functions
(src/model/track.rs:395-460).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AM_THUMBNAIL_SIZE = "300"  # reference: src/apple_music.rs:16
AM_ARTWORK_SIZE = "640"    # reference: src/apple_music.rs:17

YT_THUMBNAIL_ORDER = ("default", "medium", "high", "standard", "maxres")


def parse_rfc3339(col: Column) -> Column:
    """RFC3339 string -> naive-UTC timestamp, NULL on parse failure.

    Spark's string->timestamp cast accepts the full ISO-8601/RFC3339
    family (T separator, fractional seconds, Z or +hh:mm offsets) and
    normalizes into the session time zone; with
    ``spark.sql.session.timeZone=UTC`` this is exactly chrono's
    ``parse_from_rfc3339(..).naive_utc()`` (try_cast: ANSI-safe NULL on
    malformed input).
    """
    return col.try_cast("timestamp")


def parse_soundcloud_ts(col: Column) -> Column:
    """SoundCloud ``"%Y/%m/%d %H:%M:%S %z"`` (e.g. ``2013/03/24 12:30:59
    +0000``) -> naive-UTC timestamp, NULL on failure."""
    return F.try_to_timestamp(col, F.lit("yyyy/MM/dd HH:mm:ss Z"))


def parse_epoch_seconds(col: Column) -> Column:
    """Epoch seconds -> timestamp (``NaiveDateTime::from_timestamp``)."""
    return F.timestamp_seconds(col.try_cast("long"))


def artwork_sized(template: Column, size: str) -> Column:
    """Apple Music artwork template: replace ``{w}`` and ``{h}`` with the
    same size literal (reference: src/apple_music.rs:56-67)."""
    return F.replace(F.replace(template, F.lit("{w}"), F.lit(size)),
                     F.lit("{h}"), F.lit(size))


def yt_thumbnail_url(thumbs: Column) -> Column:
    """First present of default->medium->high->standard->maxres
    (reference: src/youtube.rs:24-30)."""
    return F.coalesce(*[thumbs[k] for k in YT_THUMBNAIL_ORDER])


def yt_artwork_url(thumbs: Column) -> Column:
    """First present of maxres->standard->high->medium->default
    (reference: src/youtube.rs:32-39)."""
    return F.coalesce(*[thumbs[k] for k in reversed(YT_THUMBNAIL_ORDER)])


def published_at_from_raw(provider: Column, raw: Column) -> Column:
    """Provider-dispatched date parse, mirroring the update_with_* family:
    YouTube/Apple Music publish RFC3339, SoundCloud its legacy format,
    Spotify rides epoch seconds in the fixture catalog."""
    return (
        F.when(provider == "SoundCloud", parse_soundcloud_ts(raw))
        .when(provider == "Spotify", parse_epoch_seconds(raw))
        .otherwise(parse_rfc3339(raw))
    )


def enrich_catalog(raw: DataFrame) -> DataFrame:
    """RAW provider-API catalog -> cooked catalog (PROVIDER_CATALOG_SCHEMA).

    Input carries ``published_at_raw`` (string, provider-formatted),
    ``artwork_template`` (string; ``{w}``/``{h}`` placeholders for Apple
    Music), ``yt_thumbnails`` (map<string,string>, partial).  Output adds
    ``published_at``, ``thumbnail_url``, ``artwork_url`` exactly as the
    reference's update_with_yt_video / update_with_sc_track /
    update_with_am_song do.
    """
    p = F.col("provider")
    thumbs = F.col("yt_thumbnails")
    template = F.col("artwork_template")
    thumbnail = (
        F.when(p == "YouTube", yt_thumbnail_url(thumbs))
        .when(p == "AppleMusic", artwork_sized(template, AM_THUMBNAIL_SIZE))
        .otherwise(template)  # SoundCloud/Spotify: artwork url verbatim
    )
    artwork = (
        F.when(p == "YouTube", yt_artwork_url(thumbs))
        .when(p == "AppleMusic", artwork_sized(template, AM_ARTWORK_SIZE))
        .otherwise(template)
    )
    return (
        raw
        .withColumn("published_at",
                    published_at_from_raw(p, F.col("published_at_raw")))
        .withColumn("thumbnail_url", thumbnail)
        .withColumn("artwork_url", artwork)
        .drop("published_at_raw", "artwork_template", "yt_thumbnails")
    )
