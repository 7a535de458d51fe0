"""Enclosure entity persistence: find-or-create dims + catalog enrichment.

Reproduces the reference's playlistify persistence step
(reference: src/model/entry.rs:336-381): every extracted enclosure is
saved into its entity table (tracks/playlists/albums) keyed on
(provider, identifier) — find_or_create semantics
(reference: src/model/enclosure.rs:26-31, unique index
db/migrate/001_create_tracks.rb:11) — and link rows (entry ↔ enclosure)
are inserted if absent.  Playlist membership (playlist_tracks) comes from
the catalog's child lists, mirroring playlist expansion
(reference: src/scraper.rs:322-370, upsert src/model/playlist_track.rs:72-90).

All relational: dedup window + left_anti merge + broadcast catalog join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM_KINDS = ("track", "playlist", "album")


def new_dim_rows(enclosures: DataFrame, existing: DataFrame, kind: str,
                 catalog_df: DataFrame, wave: int) -> DataFrame:
    """Rows to append to the ``kind`` entity table this wave.

    - first-seen dedup within the wave on (provider, identifier), ordered
      by (url, doc_pos, child_pos) for determinism
    - left_anti against the existing dim (find_or_create)
    - broadcast-enriched from the provider catalog (stand-in for the
      reference's per-enclosure REST fetches, src/youtube.rs:202-258 etc.)
    """
    w = Window.partitionBy("provider", "identifier").orderBy(
        "url", "doc_pos", "child_pos")
    fresh = (
        enclosures.filter(F.col("kind") == kind)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .join(existing.select("provider", "identifier"),
              on=["provider", "identifier"], how="left_anti")
    )
    cat = catalog_df.filter(F.col("kind") == kind).select(
        "provider", "identifier",
        F.col("title").alias("cat_title"),
        F.col("owner_name").alias("cat_owner_name"),
        F.col("url").alias("cat_url"),
        F.col("thumbnail_url").alias("cat_thumbnail_url"),
        F.col("artwork_url").alias("cat_artwork_url"),
        F.col("duration").alias("cat_duration"),
        F.col("published_at").alias("cat_published_at"),
    )
    return (
        fresh.join(F.broadcast(cat), on=["provider", "identifier"], how="left")
        .select(
            "provider", "identifier",
            # fetch miss -> Track::new defaults: title = identifier
            # (reference: src/model/track.rs Track::new / disable path)
            F.coalesce("cat_title", "identifier").alias("title"),
            F.col("owner_id"),
            F.col("cat_owner_name").alias("owner_name"),
            F.col("cat_url").alias("provider_url"),
            F.col("cat_thumbnail_url").alias("thumbnail_url"),
            F.col("cat_artwork_url").alias("artwork_url"),
            F.coalesce("cat_duration", F.lit(0)).alias("duration"),
            F.col("cat_published_at").alias("published_at"),
            "state",
            F.lit(wave).alias("first_wave"),
        )
    )


def link_rows(enclosures: DataFrame, kind: str, wave: int) -> DataFrame:
    """entry-url ↔ enclosure link rows ({kind}_entries analog;
    reference: src/model/entry.rs:383-408 INSERT-if-absent).  Enclosures
    are already per-entry deduped by the extractor, so rows are unique."""
    return (
        enclosures.filter(F.col("kind") == kind)
        .select("url", "provider", "identifier",
                "doc_pos", "child_pos",
                F.lit(wave).alias("first_wave"))
    )


def playlist_track_rows(playlists_new: DataFrame, catalog_df: DataFrame,
                        wave: int) -> DataFrame:
    """playlist_tracks membership from catalog child lists
    (reference: src/model/playlist.rs:445-489 add_tracks + upsert
    src/model/playlist_track.rs:72-90)."""
    cat = catalog_df.filter(F.col("kind") == "playlist").select(
        "provider", "identifier", "child_identifiers")
    return (
        playlists_new.select("provider", "identifier")
        .join(F.broadcast(cat), on=["provider", "identifier"], how="inner")
        .select("provider",
                F.col("identifier").alias("playlist_identifier"),
                F.posexplode("child_identifiers").alias("pos", "track_identifier"),
                )
        .withColumn("first_wave", F.lit(wave))
    )
