"""Sitemap ingestion: sitemap.xml bodies -> distributed seed-URL frames.

Companion to robots.py (whose parser already collects ``Sitemap:``
lines): a production crawler seeds its frontier not only from a seed
list but from the per-host sitemaps robots.txt advertises.  This module
parses sitemap XML — both ``<urlset>`` leaves and ``<sitemapindex>``
trees (https://www.sitemaps.org/protocol.html) — with a vectorized Arrow
batch UDF and resolves index indirection with DataFrame joins only, so a
10^8-row sitemap corpus never touches the driver.  The output plugs
straight into ``CrawlDriver.bootstrap`` (which accepts a URL DataFrame).

Scale shape: bodies live in a ``(url, host, body)`` table exactly like
``pages``; index resolution is ``levels`` self-join passes (the protocol
nests at most one level in practice; we default to 2).
"""

from __future__ import annotations

from typing import Iterable
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTRY_SCHEMA = T.StructType([
    T.StructField("sitemap_url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("kind", T.StringType()),      # 'url' | 'sitemap'
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),   # raw W3C datetime, optional
])


def _local(tag: str) -> str:
    """Strip the XML namespace: '{ns}url' -> 'url'."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_xml(body) -> list:
    """One sitemap body -> [(kind, loc, lastmod)].

    kind 'url' for <urlset><url>, 'sitemap' for <sitemapindex><sitemap>.
    Tolerates bytes or str, any/no namespace, and malformed XML (-> []).
    """
    if body is None:
        return []
    if isinstance(body, str):
        body = body.encode("utf-8")
    try:
        root = ElementTree.fromstring(body)
    except ElementTree.ParseError:
        return []
    kind = {"urlset": "url", "sitemapindex": "sitemap"}.get(_local(root.tag))
    if kind is None:
        return []
    out = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        loc, lastmod = None, None
        for f in child:
            if _local(f.tag) == "loc":
                loc = (f.text or "").strip() or None
            elif _local(f.tag) == "lastmod":
                lastmod = (f.text or "").strip() or None
        if loc:
            out.append((kind, loc, lastmod))
    return out


def sitemap_entries(bodies: DataFrame) -> DataFrame:
    """(url, host, body) -> exploded entry rows (Arrow batch parse)."""
    def parse_batches(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = {k: [] for k in ("sitemap_url", "host", "kind", "loc",
                                    "lastmod")}
            for url, host, body in zip(pdf["url"], pdf["host"], pdf["body"]):
                for kind, loc, lastmod in parse_sitemap_xml(body):
                    rows["sitemap_url"].append(url)
                    rows["host"].append(host)
                    rows["kind"].append(kind)
                    rows["loc"].append(loc)
                    rows["lastmod"].append(lastmod)
            yield pd.DataFrame(rows)

    return bodies.select("url", "host", "body").mapInPandas(
        parse_batches, schema=ENTRY_SCHEMA)


def roots_from_robots(robots: DataFrame) -> DataFrame:
    """Explode the robots table's advertised ``Sitemap:`` URLs
    (crawl/robots.py collects them) into a roots frame for
    sitemap_seed_urls — the full robots.txt -> sitemap -> frontier
    discovery path with no driver materialization."""
    return robots.select(F.explode("sitemaps").alias("url")).distinct()


def sitemap_seed_urls(bodies: DataFrame, roots: DataFrame | None = None,
                      levels: int = 2) -> DataFrame:
    """Resolve sitemap indirection and return distinct page URLs.

    ``bodies``: all known sitemap documents ``(url, host, body)``.
    ``roots``: optional ``(url)`` frame restricting which sitemaps to
    start from (e.g. robots.py's advertised ``sitemaps``); default = all.
    Index entries are resolved by equi-joining their ``loc`` back onto
    ``bodies.url`` for up to ``levels`` passes — never on the driver.
    """
    frontier = bodies if roots is None else bodies.join(
        roots.select(F.col("url")).distinct(), "url", "left_semi")
    urls = None
    for _ in range(levels):
        entries = sitemap_entries(frontier)
        level_urls = entries.filter(F.col("kind") == "url").select("loc")
        urls = level_urls if urls is None else urls.unionByName(level_urls)
        subrefs = entries.filter(F.col("kind") == "sitemap").select(
            F.col("loc").alias("url")).distinct()
        frontier = bodies.join(subrefs, "url", "left_semi")
    return urls.select(F.col("loc").alias("url")).distinct()
