"""Generate the crawl_two_waves oracle fixture.

Runs the SEQUENTIAL reference-semantics simulator (pink_spider_spark/
crawl/simulator.py — the independent model the Spark pipeline is parity-
tested against) on the exact corpus/config the registered query
``crawl_two_waves`` uses (100 pages, 8 seeds, depth 1, 2 waves) and
writes the expected seen table to fixtures/crawl_two_waves_seen.csv.
The DuckDB oracle reads this file, upgrading the query from a rows-only
check to full rows+schema+hash.  Re-run after any change to the synth
corpus, crawl ordering, or politeness rules:

    python scripts/gen_crawl_oracle.py
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pink_spider_spark.crawl.simulator import simulate  # noqa: E402
from pink_spider_spark.sources.synth import (  # noqa: E402
    build_catalog_items, gen_pages_local, robots_rows, seed_urls)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "crawl_two_waves_seen.csv")


def main():
    items = build_catalog_items()
    pages_local = gen_pages_local(100, items)
    pages_map = dict(zip(pages_local.url, pages_local.html))
    robots_map = {
        r["host"]: {"disallow_prefixes": list(r["disallow_prefixes"]),
                    "max_per_wave": int(r["max_per_wave"])}
        for _, r in robots_rows().iterrows()
    }
    sim = simulate(pages_map, robots_map, items, seed_urls(8),
                   max_depth=1, max_waves=2)
    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "first_wave", "seq"])
        for (url, wave, seq) in sorted(sim.seen, key=lambda t: t[2]):
            w.writerow([url, wave, seq])
    print(f"{OUT}: {len(sim.seen)} rows")


if __name__ == "__main__":
    main()
