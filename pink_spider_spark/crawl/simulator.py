"""Sequential reference-semantics crawler — the parity oracle.

Implements the SAME canonical wave semantics as the Spark driver
(driver.py module docstring) in plain single-threaded Python, the way the
reference's batch binaries run their loops (reference:
src/rss_crawler.rs:11-44).  The parity test asserts that the Spark
pipeline — which computes waves set-wise under arbitrary partitioning —
produces the identical (url -> (wave, seq)) map and entry/enclosure sets.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..extract import extract
from ..functions.udfs import _canon_one
from ..providers import Catalog

PRIORITY_DECAY = 0.8
DEFAULT_MAX_PER_WAVE = 16


@dataclass
class SimResult:
    seen: list = field(default_factory=list)        # (url, wave, seq) in order
    entries: dict = field(default_factory=dict)     # url -> dict
    enclosures: list = field(default_factory=list)  # (url, kind, provider, identifier)
    frontier: dict = field(default_factory=dict)    # url -> dict(state)
    waves: int = 0


def simulate(pages: dict, robots: dict, catalog_items: dict, seed_urls: list,
             max_depth: int = 3, max_waves: int = 100,
             trap_filter: bool = False, url_filter: bool = False,
             blocked_hosts: tuple = ()) -> SimResult:
    """pages: url -> html (str|bytes); robots: host -> {disallow_prefixes,
    max_per_wave}; returns the canonical crawl trace."""
    res = SimResult()
    for u in seed_urls:
        res.frontier[u] = {"priority": 1.0, "depth": 0, "status": "pending"}
    _run_waves(res, pages, robots, Catalog(catalog_items),
               max_depth, max_waves, trap_filter, url_filter, blocked_hosts)
    return res


def recrawl(res: SimResult, pages: dict, robots: dict, catalog_items: dict,
            urls: list, max_depth: int = 3, max_waves: int = 100,
            trap_filter: bool = False, url_filter: bool = False,
            blocked_hosts: tuple = ()) -> SimResult:
    """Force re-crawl semantics (reference: src/main.rs:162-192
    find_or_playlistify force=true), the driver.recrawl parity oracle:
    known urls flip to status 'recrawl' — re-fetched and their
    entry/enclosures REPLACED, seen ordering untouched; unknown urls
    enqueue as fresh pending rows (create_by_url) and enter the seen
    sequence normally.  Continues the wave loop on the existing trace."""
    for u in urls:
        row = res.frontier.get(u)
        if row is None:
            res.frontier[u] = {"priority": 1.0, "depth": 0,
                               "status": "pending"}
        elif row["status"] not in ("pending", "recrawl"):
            row["status"] = "recrawl"
    _run_waves(res, pages, robots, Catalog(catalog_items),
               max_depth, max_waves, trap_filter, url_filter, blocked_hosts)
    return res


def _run_waves(res: SimResult, pages: dict, robots: dict, catalog,
               max_depth: int, max_waves: int, trap_filter: bool,
               url_filter: bool = False, blocked_hosts: tuple = ()) -> None:
    seq = res.seen[-1][2] if res.seen else 0
    start = res.waves

    for wave in range(start + 1, start + max_waves + 1):
        pending = [u for u, r in res.frontier.items()
                   if r["status"] in ("pending", "recrawl")]
        if not pending:
            break
        res.waves = wave

        # robots exclusion
        eligible = []
        for u in pending:
            host = _host(u)
            rules = robots.get(host, {})
            path = _path(u)
            if any(path.startswith(p) for p in rules.get("disallow_prefixes", [])):
                res.frontier[u]["status"] = "excluded"
            else:
                eligible.append(u)

        # per-host budget: (priority DESC, url ASC)
        by_host: dict = {}
        for u in eligible:
            by_host.setdefault(_host(u), []).append(u)
        batch = []
        for host, urls in by_host.items():
            budget = robots.get(host, {}).get("max_per_wave", DEFAULT_MAX_PER_WAVE)
            urls.sort(key=lambda u: (-res.frontier[u]["priority"], u))
            batch.extend(urls[:budget])

        if not batch:
            break

        # in-wave order
        batch.sort(key=lambda u: (-res.frontier[u]["priority"], u))

        discovered: dict = {}
        for u in batch:
            was_recrawl = res.frontier[u]["status"] == "recrawl"
            if not was_recrawl:
                seq += 1
                res.seen.append((u, wave, seq))
            html = pages.get(u)
            if html is None:
                # a failed force keeps the cached entry (reference:
                # find_or_playlistify propagates the error, no save)
                res.frontier[u]["status"] = "missing"
                continue
            res.frontier[u]["status"] = "fetched"
            product = extract(html, u, catalog)
            og = product.og
            if was_recrawl:
                res.enclosures = [t for t in res.enclosures if t[0] != u]
            res.entries[u] = {
                "url": u,
                "title": og.get("title"),
                "description": og.get("description"),
                "visual_url": og["images"][0] if og["images"] else None,
                "locale": og.get("locale"),
                "content": product.content,
                "text": product.text,
                "crawled_wave": wave,
            }
            for row in (product.tracks + product.playlists + product.albums):
                res.enclosures.append(
                    (u, row["kind"], row["provider"], row["identifier"]))
            parent = res.frontier[u]
            if parent["depth"] + 1 <= max_depth:
                for link in product.links:
                    c = _canon_one(link)
                    if not c.startswith("http"):
                        continue
                    if trap_filter:
                        from .traps import is_trap_url
                        if is_trap_url(c):
                            continue
                    if url_filter:
                        from .urlfilter import is_url_allowed
                        if not is_url_allowed(c, blocked_hosts):
                            continue
                    prio = parent["priority"] * PRIORITY_DECAY
                    d = discovered.get(c)
                    if d is None:
                        discovered[c] = {"priority": prio, "depth": parent["depth"] + 1}
                    else:
                        d["priority"] = max(d["priority"], prio)
                        d["depth"] = min(d["depth"], parent["depth"] + 1)

        for u, row in discovered.items():
            if u not in res.frontier:
                res.frontier[u] = {**row, "status": "pending"}


def _host(url: str) -> str:
    from urllib.parse import urlsplit
    return (urlsplit(url).hostname or "").lower()


def _path(url: str) -> str:
    from urllib.parse import urlsplit
    return urlsplit(url).path or "/"
