"""Explicit StructTypes for every engine table.

``pages`` is the authoritative input shape from BASELINE.json input_hint:
(url string, warc_ts timestamp, html binary, text string, lang string).
The crawl-state tables follow FIXTURES.md §2-4; entity tables mirror the
reference's Postgres schema (reference: db/migrate/*, SURVEY.md §1.1).
"""

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),   # golden extraction output
    T.StructField("lang", T.StringType(), True),
])

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("host", T.StringType(), False),
    T.StructField("priority", T.DoubleType(), False),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("discovered_wave", T.IntegerType(), False),
    T.StructField("status", T.StringType(), False),  # pending|fetched|excluded|missing
])

SEEN_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("first_wave", T.IntegerType(), False),
    T.StructField("seq", T.LongType(), False),  # global crawl-order position
])

ROBOTS_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
    T.StructField("crawl_delay_ms", T.IntegerType(), True),
    T.StructField("max_per_wave", T.IntegerType(), True),
])

METRICS_SCHEMA = T.StructType([
    T.StructField("wave", T.IntegerType(), False),
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("fetched", T.LongType(), False),
    T.StructField("missing", T.LongType(), False),
    T.StructField("extracted_tracks", T.LongType(), False),
    T.StructField("extracted_playlists", T.LongType(), False),
    T.StructField("extracted_albums", T.LongType(), False),
    T.StructField("links_found", T.LongType(), False),
    # wave-level stage timings (driver wall-clock per pipeline stage),
    # carried on the partition_id = -1 driver row only — the operator's
    # fixed-vs-variable cost split without re-profiling; NULL on
    # per-partition lineage rows
    T.StructField("stage_secs",
                  T.MapType(T.StringType(), T.DoubleType()), True),
])

# entry rows mirror reference entries (db/migrate/002,004,020,021) minus
# wall-clock columns: crawled/updated derive from the wave number.  The
# denormalized enclosures/links arrays play the role of the reference's
# `enclosure`/`alternate` jsonb columns (db/migrate/020) and make the
# entries table the single staged write of each wave's extraction pass —
# downstream plans read it with column pruning.
ENTRY_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("visual_url", T.StringType(), True),
    T.StructField("locale", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("enclosures", T.ArrayType(T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("provider", T.StringType()),
        T.StructField("identifier", T.StringType()),
        T.StructField("owner_id", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("in_catalog", T.BooleanType()),
        T.StructField("doc_pos", T.IntegerType()),
        T.StructField("child_pos", T.IntegerType()),
    ])), True),
    T.StructField("links", T.ArrayType(T.StringType()), True),
    T.StructField("crawled_wave", T.IntegerType(), False),
])

ENCLOSURE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),         # owning entry url
    T.StructField("kind", T.StringType(), False),        # track|playlist|album
    T.StructField("provider", T.StringType(), False),
    T.StructField("identifier", T.StringType(), False),
    T.StructField("owner_id", T.StringType(), True),
    T.StructField("state", T.StringType(), False),
    T.StructField("in_catalog", T.BooleanType(), False),
    T.StructField("doc_pos", T.IntegerType(), False),
    T.StructField("child_pos", T.IntegerType(), False),
])

# tracks/playlists/albums entity tables (reference: db/migrate/001/008/010;
# natural key (provider, identifier), deterministic — no uuid v4)
ENCLOSURE_DIM_SCHEMA = T.StructType([
    T.StructField("provider", T.StringType(), False),
    T.StructField("identifier", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("owner_id", T.StringType(), True),
    T.StructField("owner_name", T.StringType(), True),
    T.StructField("provider_url", T.StringType(), True),
    T.StructField("thumbnail_url", T.StringType(), True),
    T.StructField("artwork_url", T.StringType(), True),
    T.StructField("duration", T.IntegerType(), True),
    T.StructField("published_at", T.TimestampType(), True),
    T.StructField("state", T.StringType(), True),
    # velocity: reference adds it to playlists only (db/migrate/
    # 022_add_velocity_to_playlists.rb, float NOT NULL DEFAULT 0);
    # carried on the shared dim schema (always 0 for tracks/albums) so
    # find_actives (src/model/playlist.rs:263-270) reads it in place
    T.StructField("velocity", T.DoubleType(), True),
    T.StructField("first_wave", T.IntegerType(), False),
])

PLAYLIST_TRACKS_SCHEMA = T.StructType([
    T.StructField("provider", T.StringType(), False),
    T.StructField("playlist_identifier", T.StringType(), False),
    T.StructField("pos", T.IntegerType(), False),
    T.StructField("track_identifier", T.StringType(), False),
    T.StructField("first_wave", T.IntegerType(), False),
])

PROVIDER_CATALOG_RAW_SCHEMA = T.StructType([
    T.StructField("provider", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("identifier", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("owner_id", T.StringType(), True),
    T.StructField("owner_name", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("search_term", T.StringType(), True),
    T.StructField("published_at_raw", T.StringType(), True),
    T.StructField("artwork_template", T.StringType(), True),
    T.StructField("yt_thumbnails",
                  T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("audio_url", T.StringType(), True),
    T.StructField("duration", T.IntegerType(), True),
    T.StructField("state", T.StringType(), True),
    T.StructField("child_identifiers", T.ArrayType(T.StringType()), True),
])

PROVIDER_CATALOG_SCHEMA = T.StructType([
    T.StructField("provider", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("identifier", T.StringType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("owner_id", T.StringType(), True),
    T.StructField("owner_name", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("search_term", T.StringType(), True),
    T.StructField("thumbnail_url", T.StringType(), True),
    T.StructField("artwork_url", T.StringType(), True),
    T.StructField("audio_url", T.StringType(), True),
    T.StructField("duration", T.IntegerType(), True),
    T.StructField("published_at", T.TimestampType(), True),
    T.StructField("state", T.StringType(), True),
    T.StructField("child_identifiers", T.ArrayType(T.StringType()), True),
])
