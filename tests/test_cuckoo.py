"""Cuckoo-filter seen-set (crawl/cuckoo.py): the deletion-capable twin
of the sharded bloom.  Module-level filter semantics (no false
negatives, bounded fpp, exact delete), the sharded cogroup surface
(build / update / delete / prune), and end-to-end crawl parity with the
bloom-backed driver (seen_filter="cuckoo")."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pink_spider_spark.crawl.cuckoo import (
    CuckooFilter, build_cuckoo_shards, cover_all_cuckoo_shards,
    delete_from_cuckoo_shards, prune_with_cuckoo_shards,
    update_cuckoo_shards)
from pink_spider_spark.crawl.driver import CrawlConfig, CrawlDriver
from pink_spider_spark.sources.synth import (build_catalog_items,
                                             gen_pages_spark, robots_rows,
                                             seed_urls)
from pink_spider_spark.sources.tables import TableStore

N_SHARDS = 8


def _rand_keys(n, seed):
    return np.random.default_rng(seed).integers(
        -2**63, 2**63 - 1, size=n, dtype=np.int64)


def test_cuckoo_no_false_negatives_and_low_fpp():
    keys = _rand_keys(20_000, 1)
    probes = _rand_keys(20_000, 2)
    cf = CuckooFilter.sized_for(len(keys))
    cf.add_many(keys)
    assert cf.contains_many(keys).all()  # hard guarantee
    # 16-bit fingerprints: theoretical fpp ~ 8/2^16 ~ 0.00012
    fp = cf.contains_many(probes).sum()
    assert fp / len(probes) < 0.005


def test_cuckoo_delete_restores_empty_table():
    # deleting every inserted key removes exactly one stored copy each,
    # so the table returns to all-zero — the exactness property the
    # bloom cannot offer
    keys = _rand_keys(5_000, 3)
    cf = CuckooFilter.sized_for(len(keys))
    cf.add_many(keys)
    assert cf.delete_many(keys).all()
    assert int(cf.table.sum()) == 0


def test_cuckoo_kick_path_keeps_membership():
    # force a small table (high load) so inserts go through eviction
    # chains; membership must survive arbitrary displacement
    keys = _rand_keys(210, 4)
    cf = CuckooFilter(64)  # 256 slots, load ~0.82
    cf.add_many(keys)
    assert cf.contains_many(keys).all()


def test_cuckoo_over_capacity_raises():
    cf = CuckooFilter(2)  # 8 slots
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.add_many(_rand_keys(64, 5))


def _keys_df(spark, urls):
    return spark.createDataFrame(
        [Row(url=u) for u in urls]).withColumn(
            "url_hash", F.xxhash64("url"))


def test_sharded_cuckoo_prune_matches_exact(spark):
    seen_urls = [f"https://h{i % 13}.example.com/p{i}" for i in range(500)]
    new_urls = [f"https://h{i % 7}.example.org/n{i}" for i in range(300)]
    seen = _keys_df(spark, seen_urls)
    cands = _keys_df(spark, new_urls + seen_urls[::5])
    shards = build_cuckoo_shards(seen, "url_hash", 500, n_shards=N_SHARDS)
    out = {r.url for r in prune_with_cuckoo_shards(
        cands, seen.select("url"), shards, n_shards=N_SHARDS).collect()}
    assert out == set(new_urls)


def test_sharded_cuckoo_update_and_delete(spark):
    base = [f"https://a.example.com/{i}" for i in range(200)]
    extra = [f"https://b.example.net/{i}" for i in range(100)]
    seen = _keys_df(spark, base)
    shards = cover_all_cuckoo_shards(
        build_cuckoo_shards(seen, "url_hash", 1200, n_shards=N_SHARDS),
        N_SHARDS)
    # incremental insert: extra keys become members
    shards2 = update_cuckoo_shards(
        shards, _keys_df(spark, extra), "url_hash", N_SHARDS)
    all_seen = _keys_df(spark, base + extra)
    pruned = prune_with_cuckoo_shards(
        _keys_df(spark, base + extra), all_seen.select("url"), shards2,
        n_shards=N_SHARDS)
    assert pruned.count() == 0
    # delete the extras: they must probe as fresh again (the filter is
    # the only gate here — pass an empty seen relation so the exact
    # confirm join cannot mask a stale fingerprint)
    shards3 = delete_from_cuckoo_shards(
        shards2, _keys_df(spark, extra), "url_hash", N_SHARDS)
    empty_seen = _keys_df(spark, base).limit(0)
    back = {r.url for r in prune_with_cuckoo_shards(
        _keys_df(spark, extra), empty_seen.select("url"), shards3,
        n_shards=N_SHARDS).collect()}
    assert back == set(extra)
    # base keys stay covered after the deletion pass
    still = prune_with_cuckoo_shards(
        _keys_df(spark, base), all_seen.select("url"), shards3,
        n_shards=N_SHARDS)
    assert still.count() == 0


def test_cuckoo_crawl_parity_with_bloom(spark):
    """End-to-end: seen_filter="cuckoo" on the forced-shard at-scale path
    yields the bit-identical seen table as the bloom-backed crawl."""
    items = build_catalog_items()
    pages = gen_pages_spark(spark, 120, items).cache()
    pages.count()
    robots = spark.createDataFrame(robots_rows())
    roots = []
    seen_sets = []
    try:
        for filt in ("bloom", "cuckoo"):
            root = tempfile.mkdtemp(prefix=f"cuckoo_parity_{filt}_")
            roots.append(root)
            d = CrawlDriver(
                spark, TableStore(root), pages, robots, items,
                CrawlConfig(max_depth=2, max_waves=20, bloom_shard_min=0,
                            bloom_n_shards=8, seen_filter=filt))
            d.run(seed_urls(6))
            seen_sets.append({(r.url, r.first_wave, r.seq)
                              for r in d.store.table("seen")
                              .read(spark).collect()})
    finally:
        pages.unpersist()
        for root in roots:
            shutil.rmtree(root, ignore_errors=True)
    assert seen_sets[0] == seen_sets[1] and len(seen_sets[0]) > 0
