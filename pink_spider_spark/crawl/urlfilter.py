"""URL-level corpus filtering: the document-quality axis of URL triage
(RefinedWeb §3.1 / UT1-blocklist practice), complementing the trap
MECHANICS heuristics in crawl/traps.py.

A web-scale pipeline discards a large slice of its frontier before ever
fetching: hosts on a curated blocklist, URLs whose words signal
non-content pages (logout/cart/session), and digit-soup paths (calendar
archives, tracking ids).  All signals here are pure JVM column
expressions over the URL string — regexp extraction, not ``parse_url``,
so the DuckDB oracle mirrors them byte-for-byte — and the blocklist is
a broadcast anti-ish left join (real blocklists are ~10⁶ hosts ≈ tens
of MB: comfortably broadcast; a larger one degrades to a keyed join by
dropping the hint).

Composition point: ``CrawlDriver`` enqueue can AND ``allowed`` with the
trap filter (``traps.filter_traps``) — both ride the enqueue projection
with zero extra shuffle.  Kept opt-in to preserve reference-ordering
parity, same policy as ``CrawlConfig.trap_filter``.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Soft banned words (RefinedWeb scores URLs by weighted banned-word
#: hits; this demo list stands in for the production lexicon).
BANNED_WORDS = ("private", "logout", "signup", "cart", "session",
                "tracker")

MAX_DIGIT_FRAC = 0.5   # digit-dominated paths are archives/ids, not docs

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def host_of_url(url: Column) -> Column:
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def url_signals(df: DataFrame, url_col: str = "url",
                blocklist: DataFrame | None = None,
                max_digit_frac: float = MAX_DIGIT_FRAC) -> DataFrame:
    """Per-URL quality signals + the combined ``allowed`` verdict.

    Emits ``host``, ``digit_frac`` (digits / path length, 4 dp),
    ``banned_hits`` (count of BANNED_WORDS substrings in the URL),
    ``blocked_host`` (membership in ``blocklist``'s first column), and
    ``allowed`` = not blocked ∧ no banned words ∧ digit_frac within
    bounds.  Signals stay as columns so the decision is auditable."""
    url = F.lower(F.col(url_col))
    host = F.regexp_extract(url, _HOST_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    digit_frac = F.round(
        F.length(F.regexp_replace(path, "[^0-9]", ""))
        / F.greatest(F.length(path), F.lit(1)), 4)
    banned = F.size(F.filter(
        F.array(*[F.lit(w) for w in BANNED_WORDS]),
        lambda w: F.contains(url, w))).cast("int")
    out = (df.withColumn("host", host)
           .withColumn("digit_frac", digit_frac)
           .withColumn("banned_hits", banned))
    if blocklist is not None:
        bl = (blocklist
              .select(F.lower(F.col(blocklist.columns[0])).alias("host"))
              .distinct()
              .withColumn("__bl", F.lit(True)))
        out = (out.join(F.broadcast(bl), "host", "left")
               .withColumn("blocked_host",
                           F.coalesce(F.col("__bl"), F.lit(False)))
               .drop("__bl"))
    else:
        out = out.withColumn("blocked_host", F.lit(False))
    return out.withColumn(
        "allowed",
        ~F.col("blocked_host") & (F.col("banned_hits") == 0)
        & (F.col("digit_frac") <= F.lit(float(max_digit_frac))))


_HOST_PY = re.compile(_HOST_RE)
_PATH_PY = re.compile(_PATH_RE)


def is_url_allowed(url: str, blocked_hosts=(),
                   max_digit_frac: float = MAX_DIGIT_FRAC) -> bool:
    """Sequential-simulator twin of ``url_signals(...).allowed`` (same
    regexes, same HALF_UP 4-dp digit-fraction rounding) so crawl parity
    tests can enable the filter in both engines."""
    u = url.lower()
    m = _HOST_PY.match(u)
    host = m.group(1) if m else ""
    if host in {h.lower() for h in blocked_hosts}:
        return False
    if any(w in u for w in BANNED_WORDS):
        return False
    pm = _PATH_PY.match(u)
    path = pm.group(1) if pm and pm.group(1) else ""
    digits = sum(c.isdigit() for c in path)
    frac = math.floor(digits / max(len(path), 1) * 1e4 + 0.5) / 1e4
    return frac <= max_digit_frac


def filter_urls(links: DataFrame, url_col: str = "url",
                blocklist: DataFrame | None = None,
                max_digit_frac: float = MAX_DIGIT_FRAC) -> DataFrame:
    """Drop disallowed URLs from a discovered-links frame, returning the
    input columns unchanged (the enqueue-projection form of
    ``url_signals``)."""
    cols = links.columns
    return (url_signals(links, url_col, blocklist, max_digit_frac)
            .filter(F.col("allowed")).select(*cols))


# ---------------------------------------------------------------- SURT
def surt(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform (Heritrix / Internet
    Archive; the key form of every CDX index and of Heritrix
    SurtPrefixScope crawl scoping): lowercase, drop the scheme, reverse
    the host labels comma-joined, append ``,:port`` when present, close
    with ``)`` and the path+query verbatim —
    ``http://www.Example.COM:8080/A?q`` →
    ``com,example,www,:8080)/a?q``.  Reversed-host ordering makes one
    DOMAIN a contiguous key RANGE: every subdomain and path under
    example.com sorts inside the prefix ``com,example``, so crawl
    scoping, per-domain budgeting and CDX lookup are all prefix scans —
    the property plain URLs lack because subdomains sort apart.  Pure
    JVM column expressions (regexp + split/reverse/join), mirrored
    byte-for-byte by the SQL oracle."""
    u = F.lower(url)
    hostport = F.regexp_extract(u, _HOST_RE, 1)
    hostname = F.regexp_extract(hostport, r"^([^:]+)", 1)
    port = F.regexp_extract(hostport, r"(:[0-9]+)$", 1)
    rest = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1)
    rev = F.array_join(F.reverse(F.split(hostname, r"\.")), ",")
    return F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(","), port)),
        F.lit(")"),
        F.when(rest == "", F.lit("/")).otherwise(rest))


def surt_domain_key(url: Column, labels: int = 2) -> Column:
    """The first ``labels`` reversed host labels (``com,example``) —
    the per-domain prefix under which every subdomain's SURT sorts;
    the grouping key for per-domain crawl budgets over a CDX-shaped
    frontier."""
    hostname = F.regexp_extract(
        F.regexp_extract(F.lower(url), _HOST_RE, 1), r"^([^:]+)", 1)
    return F.array_join(
        F.slice(F.reverse(F.split(hostname, r"\.")), 1, labels), ",")
