"""Sharded cuckoo filter for the URL-seen set — the deletion-capable
twin of the sharded bloom (crawl/bloom.py).

North-rule component: "broadcast bloom/cuckoo URL-seen filter keyed on
canonicalized+hashed URLs".  The bloom form (the default) is cheaper to
build and mergeable by OR, but a bloom bit can never be cleared: once a
URL is marked seen, only a full rebuild forgets it.  A cuckoo filter
(Fan et al. 2014, "Cuckoo Filter: Practically Better Than Bloom")
stores displaceable 16-bit fingerprints in 4-slot buckets, so it
supports DELETE — the natural fit for force re-crawl (driver.recrawl
flips frontier rows back to crawlable; with a cuckoo seen-filter the
stale fingerprint can be evicted instead of invalidating the whole
held filter) — at comparable space (~18 bits/key here vs ~10 bits/key
for a 1% bloom; fpp ≈ 2·4/2^16 ≈ 0.012% — two orders better).

Same scale architecture as the bloom: the filter is sharded by
``pmod(url_hash, n_shards)`` into a DataFrame so no full table ever
materializes on the driver or in a broadcast; build, incremental
update, delete, and the membership probe are all shard-local cogroups
(one task holds one shard's bucket array).  The probe keeps the same
safety contract: positives are confirmed with an exact left_anti join,
so a false positive can never drop a URL, and a missing shard row
means "definitely fresh".

Why membership is order-independent even though the bucket layout is
not: an insert only ever MOVES fingerprints between their two
alternate buckets (i and i ^ H(fp)), so every successfully inserted
key remains findable regardless of the kick sequence.  The layout is
therefore not bit-comparable across builds, but ``contains`` is exact
over the inserted multiset — the only property the prune and the
deletion path rely on.

The reference has no equivalent (its seen check is the per-row unique
``entries.url`` index lookup, src/model/entry.rs:206-217); this is the
10^10-URL replacement alongside the bloom.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U64 = np.uint64
_SLOTS = 4           # bucket width (Fan et al.'s sweet spot)
_MAX_KICKS = 500     # eviction chain bound before "full"
_TARGET_LOAD = 0.84  # b=4 cuckoo filters fill reliably to ~0.95; size
                     # to 0.84 so the kick chains stay short


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # errstate: modular wraparound is the point; numpy warns (only) on
    # the 0-d/scalar path the kick loop's _alt calls take
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        x ^= x >> _U64(30)
        x = (x * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
        x ^= x >> _U64(27)
        x = (x * _U64(0x94D049BB133111EB)).astype(_U64)
        x ^= x >> _U64(31)
        return x


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class CuckooFilter:
    """Partial-key cuckoo filter: ``n_buckets`` (power of two) buckets of
    ``_SLOTS`` uint16 fingerprints; 0 is the empty slot sentinel, so
    fingerprints live in [1, 0xFFFF]."""

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = int(n_buckets)
        self.table = table if table is not None else np.zeros(
            (self.n_buckets, _SLOTS), dtype=np.uint16)

    @staticmethod
    def sized_for(n: int) -> "CuckooFilter":
        import math

        n = max(n, 1)
        return CuckooFilter(_next_pow2(
            max(2, math.ceil(n / (_SLOTS * _TARGET_LOAD)))))

    # --------------------------------------------------- key derivation
    def _fp_i1(self, hashes: np.ndarray):
        # fp and i1 both derive from the splitmix-MIXED word (disjoint
        # bit ranges), never from the raw hash: the shard table keys
        # shards on pmod(hash, n_shards), so raw low bits are CONSTANT
        # within a shard — indexing buckets with them collapses i1 to
        # n_buckets/n_shards values and overflows the filter at ~1/8 of
        # its nominal load
        h = hashes.astype(np.int64).view(_U64)
        s = _splitmix64(h)
        fp = ((s >> _U64(48)) & _U64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        i1 = (s & _U64(self.n_buckets - 1)).astype(np.int64)
        return fp, i1

    def _alt(self, i: np.ndarray | int, fp) -> np.ndarray | int:
        # partner bucket: i ^ H(fp) — an involution, so either bucket
        # recovers the other from the stored fingerprint alone (what
        # makes displacement and deletion possible)
        hfp = _splitmix64(np.asarray(fp, dtype=_U64))
        return (np.asarray(i, dtype=_U64) ^ (hfp & _U64(self.n_buckets - 1))
                ).astype(np.int64)

    # ----------------------------------------------------------- insert
    def add_many(self, hashes: np.ndarray) -> None:
        """Insert every key; raises if an eviction chain exceeds
        ``_MAX_KICKS`` (the filter is over capacity — callers size via
        ``sized_for`` and rebuild on growth, same policy as the bloom).

        Bulk path is vectorized: below the target load almost every key
        lands directly in bucket i1 or i2, so two grouped-rank scatter
        passes place the whole batch in O(n log n) numpy time; only the
        residue whose both buckets are full walks the per-key eviction
        chain.  Layout differs from the sequential insert order (buckets
        are left-packed first), which is membership-irrelevant — see the
        module docstring."""
        fps, i1s = self._fp_i1(hashes)
        if len(fps) == 0:
            return
        tbl = self.table
        # left-pack every bucket (nonzero fingerprints first) so each
        # bucket's free slots are its contiguous tail
        tbl[:] = np.sort(tbl, axis=1)[:, ::-1]
        occ = (tbl != 0).sum(axis=1).astype(np.int64)
        pending = np.arange(len(fps))
        for bucket_of in (i1s, self._alt(i1s, fps)):
            if len(pending) == 0:
                break
            order = np.argsort(bucket_of[pending], kind="stable")
            bs = bucket_of[pending][order]
            # rank of each key within its same-bucket group: the j-th
            # key aimed at one bucket this pass takes slot occ + j
            newgrp = np.empty(len(bs), dtype=bool)
            newgrp[0] = True
            np.not_equal(bs[1:], bs[:-1], out=newgrp[1:])
            starts = np.nonzero(newgrp)[0]
            grp_start = np.repeat(starts,
                                  np.diff(np.append(starts, len(bs))))
            rank = np.arange(len(bs)) - grp_start
            fits = rank < (_SLOTS - occ[bs])
            put_b = bs[fits]
            tbl[put_b, occ[bs][fits] + rank[fits]] = \
                fps[pending][order][fits]
            np.add.at(occ, put_b, 1)
            pending = pending[order][~fits]
        # residue: both buckets full — per-key eviction chains
        # (deterministic slot rotation keeps runs reproducible)
        for fp, i1 in zip(fps[pending].tolist(), i1s[pending].tolist()):
            b, f = i1, fp
            for kick in range(_MAX_KICKS):
                s = kick % _SLOTS
                f, tbl[b][s] = int(tbl[b][s]), f
                b = int(self._alt(b, f))
                row = tbl[b]
                done = False
                for s2 in range(_SLOTS):
                    if row[s2] == 0:
                        row[s2] = f
                        done = True
                        break
                if done:
                    break
            else:
                raise RuntimeError(
                    "cuckoo filter over capacity (kick chain exceeded); "
                    "rebuild with a larger size")

    # --------------------------------------------------------- contains
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        fps, i1s = self._fp_i1(hashes)
        i2s = self._alt(i1s, fps)
        want = fps[:, None]
        return ((self.table[i1s] == want).any(axis=1)
                | (self.table[i2s] == want).any(axis=1))

    # ----------------------------------------------------------- delete
    def delete_many(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy of each key's fingerprint (cuckoo
        deletion is only defined for keys actually inserted — the
        standard cuckoo-filter contract).  Returns a bool array: True
        where a fingerprint was found and cleared."""
        fps, i1s = self._fp_i1(hashes)
        out = np.zeros(len(fps), dtype=bool)
        tbl = self.table
        for j, (fp, i1) in enumerate(zip(fps.tolist(), i1s.tolist())):
            for b in (i1, int(self._alt(i1, fp))):
                row = tbl[b]
                hit = np.nonzero(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[j] = True
                    break
        return out


# ------------------------------------------------------------ shard table
# Same cogroup architecture as bloom.SHARD_SCHEMA: shard-local build,
# probe, incremental insert AND incremental delete — zero driver bytes.

CUCKOO_SHARD_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("n_shards", T.IntegerType()),
    T.StructField("n_buckets", T.LongType()),
    T.StructField("table", T.BinaryType()),
])


def _shard_col(hash_col: str, n_shards: int):
    return F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int")


def build_cuckoo_shards(df: DataFrame, hash_col: str, n_estimate: int,
                        n_shards: int = 64) -> DataFrame:
    """Distributed sharded build (signature-compatible with
    ``bloom.build_bloom_shards`` minus fpp — cuckoo fpp is fixed by the
    16-bit fingerprint at ~0.012%)."""
    from ..functions.udfs import ensure_package_shipped

    ensure_package_shipped(df.sparkSession)
    n_buckets = CuckooFilter.sized_for(
        max(1, n_estimate // n_shards)).n_buckets

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        cf = CuckooFilter(n_buckets)
        cf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "shard": [int(pdf["__shard"].iloc[0])],
            "n_shards": [n_shards], "n_buckets": [n_buckets],
            "table": [cf.table.tobytes()]})

    return (df.select(hash_col)
            .withColumn("__shard", _shard_col(hash_col, n_shards))
            .groupBy("__shard")
            .applyInPandas(build, schema=CUCKOO_SHARD_SCHEMA))


def cover_all_cuckoo_shards(shards: DataFrame, n_shards: int) -> DataFrame:
    """Union in empty tables for shard ids the build saw no keys for
    (twin of ``bloom.cover_all_shards``)."""
    spark = shards.sparkSession
    meta = shards.select("n_buckets").first()
    if meta is None:
        raise ValueError("empty cuckoo shard table")
    empty = CuckooFilter(int(meta["n_buckets"]))
    ids = spark.range(n_shards).select(
        F.col("id").cast("int").alias("shard"),
        F.lit(n_shards).alias("n_shards"),
        F.lit(int(meta["n_buckets"])).alias("n_buckets"),
        F.lit(bytearray(empty.table.tobytes())).alias("table"))
    missing = ids.join(shards.select("shard"), "shard", "left_anti")
    return shards.unionByName(missing)


def _mutate_cuckoo_shards(shards: DataFrame, keys: DataFrame,
                          hash_col: str, n_shards: int,
                          delete: bool) -> DataFrame:
    from ..functions.udfs import ensure_package_shipped

    ensure_package_shipped(shards.sparkSession)

    def upd(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = [f.name for f in CUCKOO_SHARD_SCHEMA.fields]
        if left.empty:
            return right[cols]
        if right.empty:
            raise ValueError(
                "cuckoo shard missing from table; build with "
                "cover_all_cuckoo_shards or rebuild")
        cf = CuckooFilter(
            int(right["n_buckets"].iloc[0]),
            np.frombuffer(right["table"].iloc[0], dtype=np.uint16)
            .reshape(-1, _SLOTS).copy())
        ks = left[hash_col].to_numpy(dtype=np.int64)
        if delete:
            cf.delete_many(ks)
        else:
            cf.add_many(ks)
        out = right.copy()
        out["table"] = [cf.table.tobytes()]
        return out[cols]

    # unchanged-shard skip, same shape as bloom.update_bloom_shards
    # (r5): only delta-touched shards enter the pandas cogroup; the rest
    # pass through a JVM-side anti-join untouched
    keyed = (keys.select(hash_col)
             .withColumn("__shard", _shard_col(hash_col, n_shards))
             .localCheckpoint(eager=False))
    touched_ids = keyed.select(F.col("__shard").alias("shard")).distinct()
    updated = (keyed.groupBy("__shard")
               .cogroup(shards.join(touched_ids, "shard", "left_semi")
                        .groupBy("shard"))
               .applyInPandas(upd, schema=CUCKOO_SHARD_SCHEMA))
    untouched = shards.join(touched_ids, "shard", "left_anti")
    return updated.unionByName(untouched)


def update_cuckoo_shards(shards: DataFrame, new_keys: DataFrame,
                         hash_col: str, n_shards: int) -> DataFrame:
    """Insert a batch of new keys shard-locally (incremental per-wave
    update — twin of ``bloom.update_bloom_shards``)."""
    return _mutate_cuckoo_shards(shards, new_keys, hash_col, n_shards,
                                 delete=False)


def delete_from_cuckoo_shards(shards: DataFrame, keys: DataFrame,
                              hash_col: str, n_shards: int) -> DataFrame:
    """Evict a batch of previously inserted keys — the operation the
    bloom cannot do.  Force re-crawl uses this instead of dropping the
    whole held filter: the re-crawled URLs' fingerprints are cleared so
    they probe as fresh again, every other key stays covered."""
    return _mutate_cuckoo_shards(shards, keys, hash_col, n_shards,
                                 delete=True)


def prune_with_cuckoo_shards(candidates: DataFrame, seen: DataFrame,
                             shards: DataFrame, hash_col: str = "url_hash",
                             key_col: str = "url", n_shards: int = 64,
                             cache_registry: list | None = None) -> DataFrame:
    """Rows of ``candidates`` definitely absent from ``seen`` — the
    drop-in twin of ``bloom.prune_with_bloom_shards`` with the same
    safety contract: filter-positive suspects are confirmed by exact
    left_anti join (false positives never drop a URL), a missing shard
    row means "definitely fresh"."""
    from ..functions.udfs import ensure_package_shipped

    ensure_package_shipped(candidates.sparkSession)
    out_fields = list(candidates.schema.fields) + [
        T.StructField("__maybe_seen", T.BooleanType())]
    out_schema = T.StructType(out_fields)
    cand_cols = [f.name for f in candidates.schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=cand_cols + ["__maybe_seen"])
        out = left[cand_cols].copy()
        if right.empty:
            out["__maybe_seen"] = False
            return out
        cf = CuckooFilter(
            int(right["n_buckets"].iloc[0]),
            np.frombuffer(right["table"].iloc[0], dtype=np.uint16)
            .reshape(-1, _SLOTS))
        out["__maybe_seen"] = cf.contains_many(
            left[hash_col].to_numpy(dtype=np.int64))
        return out

    # lazy localCheckpoint pin, same rationale as the bloom twin (r5):
    # no eager count job; blocks materialize inside the consuming union
    flagged = (candidates
               .withColumn("__shard", _shard_col(hash_col, n_shards))
               .groupBy("__shard")
               .cogroup(shards.groupBy("shard"))
               .applyInPandas(probe, schema=out_schema)
               .localCheckpoint(eager=False))
    fresh = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    suspects = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    confirmed_new = suspects.join(seen.select(key_col), on=key_col,
                                  how="left_anti")
    return fresh.unionByName(confirmed_new)
