"""Broadcast bloom filter for the URL-seen set.

North-rule component: "broadcast bloom/cuckoo URL-seen filter keyed on
canonicalized+hashed URLs".  The reference has no equivalent — its seen
check is a per-row SQL lookup on the unique ``entries.url`` index
(reference: src/model/entry.rs:206-217); at 10^10 URLs that becomes this:

- keys are xxhash64(canonical url) computed JVM-side (functions/udfs.py)
- k probe positions derive from the single 64-bit key by splitmix64
  double-hashing — no re-hashing of strings in Python
- the filter is BUILT distributed (one partial bitmap per partition,
  OR-reduced on the driver) and SHIPPED as a broadcast variable
- membership is vectorized numpy over Arrow batches
- a confirming exact anti-join removes false positives, so the bloom is
  purely a shuffle-volume optimization and can never drop a URL

Scale path (documented, not needed at sandbox scale): shard the bitmap by
``pmod(url_hash, n_shards)`` into a bloom-shard table co-partitioned with
the frontier's hash buckets, so each executor only holds its shard;
broadcast stays viable to ~1e9 keys (1.2 GB at 1% fpp).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    x ^= x >> _U64(30)
    x = (x * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
    x ^= x >> _U64(27)
    x = (x * _U64(0x94D049BB133111EB)).astype(_U64)
    x ^= x >> _U64(31)
    return x


class BloomFilter:
    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.bits = bits if bits is not None else np.zeros(
            (self.m_bits + 63) // 64, dtype=_U64)

    @staticmethod
    def sized_for(n: int, fpp: float = 0.01) -> "BloomFilter":
        n = max(n, 1)
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return BloomFilter(m, k)

    def _positions(self, hashes: np.ndarray):
        h1 = hashes.astype(np.int64).view(_U64)
        h2 = _splitmix64(h1) | _U64(1)
        m = _U64(self.m_bits)
        for i in range(self.k):
            yield ((h1 + _U64(i) * h2) % m)

    def add_many(self, hashes: np.ndarray) -> None:
        for pos in self._positions(hashes):
            # np.bitwise_or.at: unbuffered, so duplicate word indices in one
            # batch all land (plain fancy-index |= silently drops duplicates)
            np.bitwise_or.at(
                self.bits,
                (pos >> _U64(6)).astype(np.int64),
                _U64(1) << (pos & _U64(63)))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        out = np.ones(len(hashes), dtype=bool)
        for pos in self._positions(hashes):
            word = self.bits[(pos >> _U64(6)).astype(np.int64)]
            out &= (word >> (pos & _U64(63))) & _U64(1) != 0
        return out


def build_bloom(df: DataFrame, hash_col: str, n_estimate: int,
                fpp: float = 0.01) -> BloomFilter:
    """Distributed build: one partial bitmap per partition, OR-reduce."""
    from ..functions.udfs import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    proto = BloomFilter.sized_for(n_estimate, fpp)
    m_bits, k = proto.m_bits, proto.k

    def partial(batches):
        bf = BloomFilter(m_bits, k)
        for pdf in batches:
            bf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        yield pd.DataFrame({"bitmap": [bf.bits.tobytes()]})

    parts = df.select(hash_col).mapInPandas(
        partial, schema=T.StructType([T.StructField("bitmap", T.BinaryType())]))
    bf = BloomFilter(m_bits, k)
    for row in parts.collect():
        bf.bits |= np.frombuffer(row.bitmap, dtype=_U64)
    return bf


def prune_with_bloom(candidates: DataFrame, seen: DataFrame, bloom: BloomFilter,
                     hash_col: str = "url_hash", key_col: str = "url",
                     cache_registry: list | None = None) -> DataFrame:
    """Rows of ``candidates`` definitely absent from ``seen``.

    Bloom-negative rows skip the shuffle entirely; bloom-positive suspects
    are confirmed with an exact left_anti join (no false drops).

    The flagged intermediate is cached; pass ``cache_registry`` to receive
    it for unpersisting once the consuming job has committed.
    """
    from ..functions.udfs import ensure_package_shipped

    spark = candidates.sparkSession
    ensure_package_shipped(spark)
    b = spark.sparkContext.broadcast((bloom.m_bits, bloom.k, bloom.bits.tobytes()))

    @F.pandas_udf(T.BooleanType())
    def might_contain(hashes: pd.Series) -> pd.Series:
        m_bits, k, raw = b.value
        bf = BloomFilter(m_bits, k, np.frombuffer(raw, dtype=_U64))
        return pd.Series(bf.contains_many(hashes.to_numpy(dtype=np.int64)))

    # cached + eagerly materialized: both the fresh and the suspect branch
    # read this, and the bloom UDF must not run twice (two branches of one
    # union would otherwise race past the unpopulated cache)
    flagged = candidates.withColumn(
        "__maybe_seen", might_contain(F.col(hash_col))).cache()
    flagged.count()
    if cache_registry is not None:
        cache_registry.append(flagged)
    fresh = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    suspects = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    confirmed_new = suspects.join(seen.select(key_col), on=key_col, how="left_anti")
    return fresh.unionByName(confirmed_new)
