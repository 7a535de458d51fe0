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
- ``Disallow:`` with an empty value means allow-all (ignored); the
  scheduler's ``disallow_prefixes`` column keeps the path-*prefix* model
  (the contract the sequential parity simulator shares, matching the
  reference's crawl ordering); the FULL RFC 9309 rule model — ``Allow:``
  precedence, ``*`` wildcards, ``$`` end anchor, longest-match — is the
  ``rules`` field + the relational ``rep_decisions`` matcher below
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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
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
    """Parse one robots.txt body ->
    {disallow_prefixes, crawl_delay, sitemaps, rules}.

    ``body`` may be bytes (decoded utf-8, errors=replace — robots files in
    the wild carry stray latin-1) or str.  Group selection per RFC 9309:
    most-specific user-agent match wins; '*' is the fallback.

    ``rules`` is the full RFC 9309 rule list of the chosen group in
    document order: ``[{"kind": "allow"|"disallow", "pattern": str}]``
    with empty-value rules dropped (an empty ``Disallow:`` means
    allow-all; an empty ``Allow:`` is a no-op).  ``disallow_prefixes``
    remains the scheduler's prefix-model view of the same group.
    """
    if body is None:
        return {"disallow_prefixes": [], "crawl_delay": None,
                "sitemaps": [], "rules": []}
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    agent_l = agent.lower()

    # group: {"agents": [..], "disallow": [..], "rules": [..],
    #         "delay": float|None}
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
                cur = {"agents": [], "disallow": [], "rules": [],
                       "delay": None}
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
                cur["rules"].append({"kind": "disallow", "pattern": value})
        elif field == "allow":
            if value:  # empty Allow is a no-op
                cur["rules"].append({"kind": "allow", "pattern": value})
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
                "sitemaps": sitemaps, "rules": []}
    return {"disallow_prefixes": list(chosen["disallow"]),
            "crawl_delay": chosen["delay"], "sitemaps": sitemaps,
            "rules": list(chosen["rules"])}


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


# ---------------------------------------------------------------------
# Full RFC 9309 rule matching (Allow precedence, '*' wildcard, '$' end
# anchor, longest-match).  The reference crawler (and the scheduler's
# parity contract with it) uses the prefix model above; this is the
# matcher a Common-Crawl-scale frontier needs for real-web robots files,
# exposed as a relational operator so the decision runs as one broadcast
# join + one linear agg — no per-row Python.
#
# Semantics (RFC 9309 §2.2.2 + the reference REP implementation Google
# open-sourced): a rule pattern matches the URL's path-and-query from the
# FIRST character; '*' matches any character sequence; a trailing '$'
# anchors the match at the end of the path ('$' anywhere else is a
# literal).  Among all matching rules the most specific wins — longest
# pattern in octets — and on a length tie ``allow`` wins.  No matching
# rule means allowed.
# ---------------------------------------------------------------------

REP_RULES_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("kind", T.StringType()),      # 'allow' | 'disallow'
    T.StructField("pattern", T.StringType()),
])


def rep_rules_from_bodies(bodies: DataFrame,
                          agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, body) -> long-form RFC 9309 rules table (host, kind, pattern),
    one row per rule of the agent's chosen group, in document order.
    Same Arrow batch-parse lifecycle as ``robots_table_from_bodies``."""
    def parse_batches(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = {"host": [], "kind": [], "pattern": []}
            for host, body in zip(pdf["host"], pdf["body"]):
                for r in parse_robots_txt(body, agent)["rules"]:
                    out["host"].append(host)
                    out["kind"].append(r["kind"])
                    out["pattern"].append(r["pattern"])
            yield pd.DataFrame(out)

    return bodies.select("host", "body").mapInPandas(parse_batches,
                                                     schema=REP_RULES_SCHEMA)


def rep_like_pattern(pattern: Column) -> Column:
    """REP rule pattern -> SQL LIKE pattern (escape char ``\\``).

    Escapes the LIKE metacharacters (``\\``, ``%``, ``_``) so they stay
    literal, maps ``*`` -> ``%``, and appends a trailing ``%`` unless the
    pattern ends in the ``$`` end anchor.  LIKE patterns are start-anchored
    by construction, matching REP's match-from-first-character rule.
    """
    anchored = pattern.endswith(F.lit("$"))
    body = F.when(anchored,
                  F.substring(pattern, 1, F.length(pattern) - 1)
                  ).otherwise(pattern)
    esc = F.replace(F.replace(F.replace(body,
                                        F.lit("\\"), F.lit("\\\\")),
                              F.lit("%"), F.lit("\\%")),
                    F.lit("_"), F.lit("\\_"))
    wild = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(anchored, wild).otherwise(F.concat(wild, F.lit("%")))


def rep_decisions(urls: DataFrame, rules: DataFrame,
                  id_col: str = "id", host_col: str = "host",
                  path_col: str = "pathq") -> DataFrame:
    """Evaluate RFC 9309 allow/disallow per URL against a rules table.

    ``urls``: one row per URL with ``id_col``, ``host_col`` and
    ``path_col`` (the path-and-query string the REP matches against).
    ``rules``: (host, kind, pattern) long form, e.g. from
    ``rep_rules_from_bodies``.

    Returns ``urls`` + three columns: ``rep_spec`` (specificity = octet
    length of the winning pattern; NULL when no rule matched),
    ``rep_kind`` (winning rule kind; NULL when none matched) and
    ``allowed``.

    Scale shape: the rules table is the per-host robots cache — small by
    definition (rules per host are bounded; hosts are 10^7-10^8 at a
    10^10-URL frontier, and only hosts present in the batch survive the
    join) — so it broadcasts; matching is one broadcast LEFT join on host
    with the LIKE predicate as a join-side condition, and precedence
    folds into a single per-URL linear MAX over the integer rank
    ``spec*2 + (kind='allow')`` (longest pattern wins, allow wins length
    ties — one integer encodes both).  ONE shuffle total (the id-keyed
    agg, map-side combined); no join-back, no window, no per-row Python.
    """
    rl = rules.select(
        F.col("host").alias("__rep_host"),
        F.length("pattern").alias("__rep_spec"),
        (F.col("kind") == "allow").cast("int").alias("__rep_is_allow"),
        rep_like_pattern(F.col("pattern")).alias("__rep_like_pat"))
    joined = urls.join(
        F.broadcast(rl),
        (F.col(host_col) == F.col("__rep_host"))
        & F.like(F.col(path_col), F.col("__rep_like_pat"), F.lit("\\")),
        "left")
    carried = [c for c in urls.columns if c != id_col]
    # every carried column is constant within an id group (the fan-out
    # comes only from multiple matching rules), so min() IS the value —
    # and unlike first() it is deterministic by contract
    agg = joined.groupBy(id_col).agg(
        F.max(F.col("__rep_spec") * 2 + F.col("__rep_is_allow"))
        .alias("rep_rank"),
        *[F.min(c).alias(c) for c in carried])
    return (agg
            .select(id_col, *carried, "rep_rank")
            .withColumn("rep_spec",
                        (F.col("rep_rank") / 2).cast("int"))
            .withColumn("rep_kind",
                        F.when(F.col("rep_rank").isNull(), F.lit(None))
                        .when(F.col("rep_rank") % 2 == 1, F.lit("allow"))
                        .otherwise(F.lit("disallow")))
            .withColumn("allowed",
                        F.col("rep_rank").isNull()
                        | (F.col("rep_rank") % 2 == 1))
            .drop("rep_rank"))


def rep_match(pattern: str, pathq: str) -> bool:
    """Sequential twin of one REP pattern match (parity tests) — segment
    scanning, no regex, no LIKE.  Unanchored: greedy left-to-right (each
    '*' is unbounded so greedy is exact).  Anchored ('$'): pin the first
    segment as a prefix and the last as a suffix, then greedy middles in
    between (greedy-only scanning cannot backtrack to satisfy an end
    anchor: '/a*b$' vs '/axbyb' must match on the FINAL 'b')."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    segs = body.split("*")
    if not anchored:
        if not pathq.startswith(segs[0]):
            return False
        pos = len(segs[0])
        for seg in segs[1:]:
            j = pathq.find(seg, pos)
            if j < 0:
                return False
            pos = j + len(seg)
        return True
    if len(segs) == 1:
        return pathq == segs[0]
    first, last = segs[0], segs[-1]
    if (len(pathq) < len(first) + len(last)
            or not pathq.startswith(first) or not pathq.endswith(last)):
        return False
    mid = pathq[len(first): len(pathq) - len(last)]
    pos = 0
    for seg in segs[1:-1]:
        j = mid.find(seg, pos)
        if j < 0:
            return False
        pos = j + len(seg)
    return True


def rep_allowed(rules: list, pathq: str) -> tuple:
    """Sequential twin of ``rep_decisions`` for one URL:
    ``[(kind, pattern)]`` + path-and-query -> (allowed, kind|None,
    spec|None).  Longest pattern wins; allow wins length ties."""
    best = None  # (spec, is_allow)
    for kind, pattern in rules:
        if rep_match(pattern, pathq):
            cand = (len(pattern), 1 if kind == "allow" else 0)
            if best is None or cand > best:
                best = cand
    if best is None:
        return True, None, None
    return best[1] == 1, "allow" if best[1] else "disallow", best[0]


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
