"""spark-submit entry point for the crawl engine.

  python scripts/package.py
  spark-submit --master <cluster> --py-files dist/pink_spider_spark.zip \
      scripts/run_crawl.py --pages-dir <parquet> --state-dir <dir> \
      [--seeds 1000] [--depth 3] [--max-waves 10] [--resume]

When --pages-dir is omitted a deterministic synthetic corpus is generated
in-session (sandbox mode).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", default=None)
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--pages", type=int, default=10000)
    ap.add_argument("--seeds", type=int, default=100)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--max-waves", type=int, default=100)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pink-spider-crawl").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
    from pink_spider_spark.sources.synth import (build_catalog_items,
                                                 gen_pages_spark, robots_rows,
                                                 seed_urls)
    from pink_spider_spark.sources.tables import TableStore

    items = build_catalog_items()
    if args.pages_dir:
        pages = spark.read.parquet(args.pages_dir)
    else:
        pages = gen_pages_spark(spark, args.pages, items)
    robots = spark.createDataFrame(robots_rows())
    store = TableStore(args.state_dir)
    driver = CrawlDriver(spark, store, pages, robots, items,
                         CrawlConfig(max_depth=args.depth,
                                     max_waves=args.max_waves))
    if args.resume:
        stats = driver.run(resume=True)
    else:
        stats = driver.run(seed_urls(args.seeds))
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
