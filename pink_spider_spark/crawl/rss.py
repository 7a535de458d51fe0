"""RSS/Atom feed parsing: XML bytes -> entry rows (vectorized UDF).

The reference fetches feed XML and parses with feed_rs, with an
ISO-8859-1 fallback decode driven by the Content-Type charset
(reference: src/rss.rs:24-43: charset "iso-8859-1" -> ISO_8859_1.decode,
else parse the byte stream as-is/UTF-8).  Here the XML rides a
``(feed_url, xml binary, charset)`` table (the stored-pages analog for
feeds) and one Arrow ``mapInPandas`` pass explodes it into the
``feed_entries`` relational shape the sweep consumes
(crawl/feeds.py) — no per-row Python crosses the JVM boundary.

Field mapping (mirrors feed_rs's Entry model consumed at
src/model/entry.rs:310-329 update_with_feed_entry):

- RSS 2.0 ``<item>``: guid -> origin_id, title, description -> summary,
  content:encoded -> content, author, pubDate (RFC822) -> published,
  atom:updated (RFC3339) -> updated, link -> alternate_href
- Atom ``<entry>``: id -> origin_id, title, summary, content, author/name,
  published/updated (RFC3339), link[rel=alternate or relless] href
- entry order in the document -> ``pos`` (crawl ordering determinism)
- unparseable dates -> NULL (validity predicate treats as invalid,
  src/model/entry.rs:291-293)
"""

from __future__ import annotations

import datetime
import email.utils
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ATOM_NS = "{http://www.w3.org/2005/Atom}"
CONTENT_NS = "{http://purl.org/rss/1.0/modules/content/}"

FEED_ENTRY_FIELDS = [
    T.StructField("feed_url", T.StringType()),
    T.StructField("origin_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("summary", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("author", T.StringType()),
    T.StructField("published", T.TimestampType()),
    T.StructField("updated", T.TimestampType()),
    T.StructField("alternate_href", T.StringType()),
    # jsonb dynamic columns (reference:
    # db/migrate/020_add_properties_to_entries.rb:9-11,
    # src/model/entry.rs:319-321 json!(entry.alternate/keywords/enclosure));
    # stored as JSON strings ("[]" when empty), read back with
    # get_json_object / from_json
    T.StructField("alternate", T.StringType()),
    T.StructField("keywords", T.StringType()),
    T.StructField("enclosure", T.StringType()),
    T.StructField("pos", T.IntegerType()),
]
FEED_ENTRIES_SCHEMA = T.StructType(FEED_ENTRY_FIELDS)

FEED_META_SCHEMA = T.StructType([
    T.StructField("feed_url", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("language", T.StringType()),
    T.StructField("website", T.StringType()),
])


def _json(obj) -> str:
    """Canonical compact JSON — the jsonb serialization used everywhere
    (both the parser and the synthetic fixtures), so equality is
    byte-stable."""
    import json

    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def _parse_rfc822(s: str | None) -> datetime.datetime | None:
    if not s:
        return None
    try:
        dt = email.utils.parsedate_to_datetime(s)
    except (TypeError, ValueError):
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def _parse_rfc3339(s: str | None) -> datetime.datetime | None:
    if not s:
        return None
    try:
        dt = datetime.datetime.fromisoformat(s.strip())
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return dt


def decode_feed_bytes(data, charset: str | None) -> str:
    """The reference's charset handling (src/rss.rs:31-42): an explicit
    iso-8859-1 charset decodes latin-1; anything else parses as UTF-8."""
    if isinstance(data, str):
        return data
    raw = bytes(data)
    if charset is not None and charset.strip().lower() == "iso-8859-1":
        return raw.decode("iso-8859-1")
    return raw.decode("utf-8", errors="replace")


def parse_feed(data, charset: str | None = None) -> dict:
    """XML bytes/str -> {"meta": {...}, "entries": [row dicts]}."""
    text = decode_feed_bytes(data, charset)
    # ElementTree refuses str input that still carries an encoding
    # declaration (we already decoded per the charset header) — drop it
    stripped = text.lstrip()
    if stripped.startswith("<?xml"):
        end = stripped.find("?>")
        if end != -1:
            text = stripped[end + 2:]
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return {"meta": {}, "entries": []}
    tag = root.tag.split("}")[-1].lower()
    if tag == "rss":
        channel = root.find("channel")
        if channel is None:
            return {"meta": {}, "entries": []}
        meta = {
            "title": channel.findtext("title"),
            "description": channel.findtext("description"),
            "language": channel.findtext("language"),
            "website": channel.findtext("link"),
        }
        entries = []
        for pos, item in enumerate(channel.findall("item")):
            link = item.findtext("link")
            enclosures = []
            for enc in item.findall("enclosure"):
                enclosures.append({
                    "href": enc.get("url"),
                    "type": enc.get("type"),
                    "length": int(enc.get("length"))
                    if (enc.get("length") or "").isdigit() else None,
                })
            entries.append({
                "origin_id": item.findtext("guid"),
                "title": item.findtext("title"),
                "summary": item.findtext("description"),
                "content": item.findtext(f"{CONTENT_NS}encoded"),
                "author": item.findtext("author"),
                "published": _parse_rfc822(item.findtext("pubDate")),
                "updated": _parse_rfc3339(
                    item.findtext(f"{ATOM_NS}updated")),
                "alternate_href": link,
                "alternate": _json([{"href": link}] if link else []),
                "keywords": _json([c.text or ""
                                   for c in item.findall("category")]),
                "enclosure": _json(enclosures),
                "pos": pos,
            })
        return {"meta": meta, "entries": entries}
    if tag == "feed":  # Atom
        def ft(el, name):
            return el.findtext(f"{ATOM_NS}{name}")

        meta = {
            "title": ft(root, "title"),
            "description": ft(root, "subtitle"),
            "language": root.get(
                "{http://www.w3.org/XML/1998/namespace}lang"),
            "website": None,
        }
        entries = []
        for pos, entry in enumerate(root.findall(f"{ATOM_NS}entry")):
            alternates, enclosures = [], []
            for link in entry.findall(f"{ATOM_NS}link"):
                rel = link.get("rel", "alternate")
                if rel == "alternate":
                    alternates.append({"href": link.get("href")})
                elif rel == "enclosure":
                    length = link.get("length") or ""
                    enclosures.append({
                        "href": link.get("href"),
                        "type": link.get("type"),
                        "length": int(length) if length.isdigit() else None,
                    })
            author = entry.find(f"{ATOM_NS}author")
            entries.append({
                "origin_id": ft(entry, "id"),
                "title": ft(entry, "title"),
                "summary": ft(entry, "summary"),
                "content": ft(entry, "content"),
                "author": (author.findtext(f"{ATOM_NS}name")
                           if author is not None else None),
                "published": _parse_rfc3339(ft(entry, "published")),
                "updated": _parse_rfc3339(ft(entry, "updated")),
                "alternate_href": (alternates[0]["href"]
                                   if alternates else None),
                "alternate": _json(alternates),
                "keywords": _json([c.get("term") or ""
                                   for c in entry.findall(
                                       f"{ATOM_NS}category")]),
                "enclosure": _json(enclosures),
                "pos": pos,
            })
        return {"meta": meta, "entries": entries}
    return {"meta": {}, "entries": []}


def feed_entries_from_xml(feeds_xml: DataFrame,
                          url_col: str = "feed_url", xml_col: str = "xml",
                          charset_col: str = "charset") -> DataFrame:
    """(feed_url, xml binary, charset) -> exploded ``feed_entries`` rows.

    One Arrow mapInPandas pass; each input row yields its parsed entries
    with document order preserved in ``pos``.
    """
    from ..functions.udfs import ensure_package_shipped

    ensure_package_shipped(feeds_xml.sparkSession)
    has_charset = charset_col in feeds_xml.columns

    def run(batches):
        from pink_spider_spark.crawl.rss import parse_feed

        cols = [f.name for f in FEED_ENTRY_FIELDS]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                charset = row[charset_col] if has_charset else None
                parsed = parse_feed(row[xml_col], charset)
                for e in parsed["entries"]:
                    e = dict(e)
                    e["feed_url"] = row[url_col]
                    out.append(e)
            yield pd.DataFrame(out, columns=cols)

    select_cols = [url_col, xml_col] + ([charset_col] if has_charset else [])
    return feeds_xml.select(*select_cols).mapInPandas(
        run, schema=FEED_ENTRIES_SCHEMA)
