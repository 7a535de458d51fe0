"""Crawler-trap mitigation: flag pathological URLs before they enter the
frontier.

Classic spider-trap heuristics (the same family as Heritrix's
pathological-path and too-many-path-segments rules): infinitely-deep
calendar/session/mirror pages waste the politeness budget of a host and
bloat the frontier.  All detection is pure JVM column expressions —
``rlike`` with a backreference for repeated path segments, ``parse_url``
for path/query — so the filter rides the enqueue projection with zero
Python and zero extra shuffle.

Off by default in the driver (``CrawlConfig.trap_filter``): the parity
contract vs the sequential simulator is bit-for-bit, so the simulator
carries the same rules (``is_trap_url``) and parity tests run with the
flag on and off.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_URL_LEN = 2048     # IE-era de-facto cap; longer urls are ~always traps
MAX_PATH_DEPTH = 12    # segments; Heritrix tooManyPathSegments default ~20
MAX_QUERY_PARAMS = 8
REPEAT_SEGMENTS = 3    # /foo/foo/foo -> pathologicalPath


def trap_col(url: Column) -> Column:
    """Boolean column: True when the URL matches any trap heuristic."""
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    too_long = F.length(url) > MAX_URL_LEN
    # path depth = non-empty segments
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    too_deep = depth > MAX_PATH_DEPTH
    too_many_params = (F.length(query) > 0) & \
        (F.size(F.split(query, "&")) > MAX_QUERY_PARAMS)
    # same segment REPEAT_SEGMENTS+ times consecutively: (/seg)\1{2,}
    repeated = path.rlike(r"(/[^/]+)\1{%d,}" % (REPEAT_SEGMENTS - 1))
    return too_long | too_deep | too_many_params | repeated


def filter_traps(links: DataFrame, url_field: str = "url") -> DataFrame:
    """Drop trap URLs from a discovered-links frame."""
    return links.filter(~trap_col(F.col(url_field)))


def is_trap_url(url: str) -> bool:
    """Sequential-simulator twin of trap_col (same thresholds, same
    semantics) so parity tests can enable the filter in both engines."""
    if len(url) > MAX_URL_LEN:
        return True
    parts = urlsplit(url)
    path = parts.path or ""
    segs = [s for s in path.split("/") if s]
    if len(segs) > MAX_PATH_DEPTH:
        return True
    if parts.query and len(parts.query.split("&")) > MAX_QUERY_PARAMS:
        return True
    return _REPEAT_RE.search(path) is not None


_REPEAT_RE = re.compile(r"(/[^/]+)\1{%d,}" % (REPEAT_SEGMENTS - 1))
