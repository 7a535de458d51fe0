"""Bloom filter unit tests (no Spark needed)."""

import numpy as np

from pink_spider_spark.crawl.bloom import BloomFilter


def test_no_false_negatives_dense_batch():
    # regression: duplicate word indices in one vectorized add batch must
    # all land (np.bitwise_or.at, not fancy-index |=)
    rng = np.random.default_rng(7)
    keys = rng.integers(-2**62, 2**62, size=5000, dtype=np.int64)
    bf = BloomFilter.sized_for(1000, 0.01)  # deliberately undersized: dense
    bf.add_many(keys)
    assert bf.contains_many(keys).all()


def test_fpp_reasonable():
    rng = np.random.default_rng(11)
    keys = rng.integers(-2**62, 2**62, size=10000, dtype=np.int64)
    other = rng.integers(-2**62, 2**62, size=10000, dtype=np.int64)
    bf = BloomFilter.sized_for(10000, 0.01)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()
    fp = bf.contains_many(other).mean()
    assert fp < 0.03


def test_empty_filter_contains_nothing():
    bf = BloomFilter.sized_for(100, 0.01)
    keys = np.array([1, 2, 3], dtype=np.int64)
    assert not bf.contains_many(keys).any()
