"""robots.txt ingestion: raw bodies -> the broadcast robots rules table.

The north rule calls for a "robots.txt cache as a broadcast table".  The
scheduler (scheduler.with_robots) consumes structured rules
``(host, disallow_prefixes array<string>, max_per_wave int)``; this module
produces that table from raw robots.txt *bytes*, the way a real crawl
ingests them (fetch ``https://host/robots.txt`` once per host, parse,
cache).  Parsing follows RFC 9309 group semantics:

- lines are ``field: value`` with ``#`` comments; fields case-insensitive
- consecutive ``User-agent`` lines start/extend one group; rules that
  follow apply to every agent named above them
- the group chosen for our agent is the longest-token match on the agent
  product name, falling back to the ``*`` group, else no rules
- ``Disallow:`` with an empty value means allow-all (ignored); rules are
  path *prefixes* (the model the scheduler and the sequential parity
  simulator share — ``%`` wildcards and ``Allow:`` precedence are out of
  scope and documented as such)
- ``Crawl-delay`` (non-standard but ubiquitous) is converted to the
  scheduler's per-wave URL budget: a wave models ``wave_seconds`` of
  wall-clock politeness, so ``budget = clamp(wave_seconds / delay)``
- ``Sitemap:`` lines are group-independent and collected globally

Scale shape: one row per host (10^7-10^8 rows at 10^10 URLs), parsed once
by a vectorized Arrow batch UDF, then broadcast — exactly the robots-cache
lifecycle of a production crawler, minus the refetch TTL (a re-run of
``robots_table_from_bodies`` on refreshed bodies is the refresh).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DEFAULT_AGENT = "pink-spider"
#: politeness horizon one wave models; budget = wave_seconds / crawl_delay
WAVE_SECONDS = 64.0
DEFAULT_MAX_PER_WAVE = 16   # scheduler.DEFAULT_MAX_PER_WAVE (kept in sync by test)
MAX_PER_WAVE_CAP = 1024     # a missing/zero delay must not mean "unbounded"

ROBOTS_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("disallow_prefixes", T.ArrayType(T.StringType())),
    T.StructField("max_per_wave", T.IntegerType()),
    T.StructField("crawl_delay", T.DoubleType()),
    T.StructField("sitemaps", T.ArrayType(T.StringType())),
])


def parse_robots_txt(body, agent: str = DEFAULT_AGENT) -> dict:
    """Parse one robots.txt body -> {disallow_prefixes, crawl_delay, sitemaps}.

    ``body`` may be bytes (decoded utf-8, errors=replace — robots files in
    the wild carry stray latin-1) or str.  Group selection per RFC 9309:
    most-specific user-agent match wins; '*' is the fallback.
    """
    if body is None:
        return {"disallow_prefixes": [], "crawl_delay": None, "sitemaps": []}
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    agent_l = agent.lower()

    # group: {"agents": [..], "disallow": [..], "delay": float|None}
    groups: list = []
    sitemaps: list = []
    cur = None
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not last_was_agent:
                cur = {"agents": [], "disallow": [], "delay": None}
                groups.append(cur)
            cur["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rule before any User-agent line: ignored per RFC
        if field == "disallow":
            if value:  # empty Disallow == allow all
                cur["disallow"].append(value)
        elif field == "allow":
            pass  # Allow precedence out of scope (prefix-exclusion model)
        elif field == "crawl-delay":
            try:
                d = float(value)
                cur["delay"] = d if d > 0 else None
            except ValueError:
                pass

    # longest-match agent selection; '*' scores 0, non-match scores -1
    def score(g) -> int:
        best = -1
        for a in g["agents"]:
            if a == "*":
                best = max(best, 0)
            elif a and a in agent_l:
                best = max(best, len(a))
        return best

    chosen, chosen_score = None, -1
    for g in groups:
        s = score(g)
        if s > chosen_score:  # first group wins ties (document order)
            chosen, chosen_score = g, s
    if chosen is None or chosen_score < 0:
        return {"disallow_prefixes": [], "crawl_delay": None,
                "sitemaps": sitemaps}
    return {"disallow_prefixes": list(chosen["disallow"]),
            "crawl_delay": chosen["delay"], "sitemaps": sitemaps}


def crawl_delay_to_budget(delay: float | None,
                          wave_seconds: float = WAVE_SECONDS) -> int:
    """Per-wave URL budget a crawl-delay implies (1 fetch per ``delay`` s
    over a ``wave_seconds`` politeness horizon)."""
    if delay is None or delay <= 0:
        return DEFAULT_MAX_PER_WAVE
    return max(1, min(MAX_PER_WAVE_CAP, int(wave_seconds / delay)))


def robots_table_from_bodies(bodies: DataFrame, agent: str = DEFAULT_AGENT,
                             wave_seconds: float = WAVE_SECONDS) -> DataFrame:
    """(host, body binary|string) -> scheduler-shaped robots rules table.

    Arrow mapInPandas batch parse (no per-row Python UDF); output feeds
    scheduler.with_robots unchanged — extra columns (crawl_delay,
    sitemaps) ride along for observability/sitemap seeding.
    """
    def parse_batches(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = {"host": [], "disallow_prefixes": [], "max_per_wave": [],
                   "crawl_delay": [], "sitemaps": []}
            for host, body in zip(pdf["host"], pdf["body"]):
                r = parse_robots_txt(body, agent)
                out["host"].append(host)
                out["disallow_prefixes"].append(r["disallow_prefixes"])
                out["max_per_wave"].append(
                    crawl_delay_to_budget(r["crawl_delay"], wave_seconds))
                out["crawl_delay"].append(r["crawl_delay"])
                out["sitemaps"].append(r["sitemaps"])
            yield pd.DataFrame(out)

    return bodies.select("host", "body").mapInPandas(parse_batches,
                                                     schema=ROBOTS_SCHEMA)


def robots_dict_from_bodies(bodies: dict, agent: str = DEFAULT_AGENT,
                            wave_seconds: float = WAVE_SECONDS) -> dict:
    """Sequential-simulator twin of robots_table_from_bodies:
    {host: body} -> {host: {disallow_prefixes, max_per_wave}} so parity
    tests can feed both engines from the same raw bytes."""
    out = {}
    for host, body in bodies.items():
        r = parse_robots_txt(body, agent)
        out[host] = {"disallow_prefixes": r["disallow_prefixes"],
                     "max_per_wave": crawl_delay_to_budget(
                         r["crawl_delay"], wave_seconds)}
    return out
