"""pink_spider_spark — a PySpark-native web-crawl-and-extract analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of kumabook/pink-spider (Rust + Postgres music web spider),
re-designed as idiomatic Spark:

- ``htmldom``    — stdlib-only HTML DOM (parse/serialize) used by the extractor
- ``extract``    — Readability-style content extraction + music-embed detection
                   (reference: src/scraper.rs, src/readability.rs, src/dom.rs)
- ``providers``  — provider URL pattern chain (reference: src/youtube.rs:18-20,
                   src/soundcloud.rs:9-11, src/spotify.rs:23-31, src/apple_music.rs:20-25)
- ``sources``    — table schemas, snapshot-versioned parquet tables, synthesis
- ``functions``  — pandas UDFs + Spark-native text/dedup/similarity functions
- ``operators``  — reusable DataFrame operator library (pagination, top-k, ...)
- ``crawl``      — frontier, bloom seen-filter, politeness scheduler, wave driver
"""

__version__ = "0.1.0"
