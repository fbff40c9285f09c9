"""Distributed URL-seen filters (north rule: bloom with cuckoo fallback).

Replaces the reference's in-memory ``ConcurrentSkipListSet visited``
(SiteCrawler.java:101) at 10^10-URL scale. The authoritative exact set
stays in the ``visited`` table; the filters are PREFILTERS that cut the
anti-join shuffle:

    candidates --bloom probe--> {definitely-new} ∪ {maybe-seen}
    maybe-seen --exact anti-join visited--> survivors
    admitted = definitely-new ∪ survivors

A bloom "no" is guaranteed-correct (skip the join); a false positive
just pays the join — the exact backstop preserves set equality
(audited in tests).

Construction is pure DataFrame ops: k bit positions per key via
``xxhash64(key, i) % m`` (JVM-side), explode → word index/bit mask →
``bit_or`` aggregation to ≤ m/64 rows, collected into a numpy bit
array and broadcast. Incremental: each wave's (small) insert set ORs
into the same array — no rebuild over the full history.

Algorithms: standard Bloom filters (Bloom, CACM 1970) with the
k-hash construction; cuckoo filters per Fan, Andersen, Kaminsky &
Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom"
(CoNEXT 2014) — 4-slot buckets, partial-key cuckoo hashing
(i2 = i1 XOR hash(fp)).

The cuckoo filter adds DELETION (retry re-admission: a transiently
failed URL must become fetchable again, which a bloom cannot express).
Same probe contract; per-key fingerprint + two candidate buckets,
kicked-insertion, driver-held numpy table broadcast for probes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _positions_col(key: Column, k: int, m: int) -> Column:
    return F.array(*[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)])


class SparkBloomFilter:
    def __init__(self, m_bits: int, k: int, spark):
        self.m = m_bits
        self.k = k
        self.spark = spark
        self.words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
        self._bc = None

    @classmethod
    def sized(cls, spark, expected_n: int, fpp: float = 0.01) -> "SparkBloomFilter":
        m = max(64, int(-expected_n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / max(expected_n, 1) * math.log(2)))
        return cls(m, min(k, 8), spark)

    def add_df(self, df: DataFrame, col: str) -> None:
        """OR the keys of ``df[col]`` into the filter (one small agg job)."""
        pos = _positions_col(F.col(col), self.k, self.m)
        words = (
            df.select(F.explode(pos).alias("p"))
            .select(
                (F.col("p") / 64).cast("long").alias("w"),
                # python F.shiftleft needs a literal shift; SQL form takes
                # a column expression
                F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("mask"),
            )
            .groupBy("w")
            .agg(F.bit_or("mask").alias("bits"))
            .collect()
        )
        for r in words:
            self.words[r["w"]] |= np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
        self._bc = None  # invalidate broadcast

    def _broadcast(self):
        if self._bc is None:
            self._bc = self.spark.sparkContext.broadcast(self.words)
        return self._bc

    def maybe_contains(self, key: Column) -> Column:
        """Boolean Column: False ⇒ definitely not in the filter. Bit
        positions are computed JVM-side (same xxhash64 as construction);
        only the word/mask test crosses into the Arrow UDF."""
        bc = self._broadcast()

        @F.pandas_udf(T.BooleanType())
        def probe(positions: pd.Series) -> pd.Series:
            w = bc.value
            mat = np.vstack(positions.to_numpy())  # rows × k positions
            words = w[(mat >> 6).astype(np.int64)]
            masks = np.uint64(1) << (mat.astype(np.uint64) & np.uint64(63))
            return pd.Series(((words & masks) != 0).all(axis=1))

        return probe(_positions_col(key, self.k, self.m))


def anti_join_seen(
    candidates: DataFrame,
    key: str,
    visited: DataFrame,
    visited_key: str,
    bloom: SparkBloomFilter | None,
) -> DataFrame:
    """candidates minus seen, with optional bloom prefilter. Exact-set
    semantics always (bloom only routes around the shuffle).

    The visited side is re-aliased to fresh attributes on every call —
    the engine joins against the same union-of-parts DataFrame several
    times per wave, and reusing its attribute ids across joins can trip
    Catalyst's resolver (NoSuchElementException: key not found)."""
    v = visited.select(F.col(visited_key).alias("__seen_key")).alias(
        "__seen_side"
    )
    if bloom is None:
        return candidates.join(
            v, candidates[key] == F.col("__seen_side.__seen_key"), "left_anti"
        )
    flagged = candidates.withColumn("_maybe", bloom.maybe_contains(F.col(key)))
    definite_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
    maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    survivors = maybe.join(
        v, maybe[key] == F.col("__seen_side.__seen_key"), "left_anti"
    )
    return definite_new.unionByName(survivors)


# --------------------------------------------------------------------------
# Cuckoo filter (deletable approximate membership)
# --------------------------------------------------------------------------

class SparkCuckooFilter:
    """Bucketed cuckoo filter: 4-slot buckets, 16-bit fingerprints,
    partial-key cuckoo hashing (i2 = i1 XOR hash(fp)). Supports delete —
    required for retry re-admission of transiently failed URLs, which
    the bloom layer cannot un-see."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int, spark):
        self.n = 1 << max(4, (n_buckets - 1).bit_length())  # power of two
        self.spark = spark
        self.table = np.zeros((self.n, self.SLOTS), dtype=np.uint16)
        self._bc = None
        self._rng = np.random.default_rng(42)
        # fp → alt-offset hash, precomputed ONCE with Spark's own xxhash64
        # so driver-side kicking and executor-side probing agree exactly
        rows = (
            spark.range(1 << 16)
            .select(
                F.col("id").cast("int").alias("fp"),
                F.xxhash64(F.col("id").cast("string"), F.lit(3)).alias("h"),
            )
            .collect()
        )
        self._fp_h = np.zeros(1 << 16, dtype=np.int64)
        for r in rows:
            self._fp_h[r["fp"]] = r["h"]

    @classmethod
    def sized(cls, spark, expected_n: int, load: float = 0.84) -> "SparkCuckooFilter":
        return cls(max(16, int(expected_n / (cls.SLOTS * load))), spark)

    # derivation: fp = (xxhash64(key,1) & 0xFFFF) | 1;
    # i1 = xxhash64(key,2) & (n-1); i2 = i1 XOR (fp_h[fp] & (n-1))
    def _derive_cols(self, key: Column):
        fp = (F.xxhash64(key, F.lit(1)).bitwiseAND(F.lit(0xFFFF))).bitwiseOR(F.lit(1))
        i1 = F.xxhash64(key, F.lit(2)).bitwiseAND(F.lit(self.n - 1))
        return fp, i1

    def _alt(self, fp: int, i: int) -> int:
        return (i ^ int(self._fp_h[fp])) & (self.n - 1)

    def _rows(self, df: DataFrame, col: str):
        fp, i1 = self._derive_cols(F.col(col))
        return df.select(fp.alias("fp"), i1.alias("i1")).collect()

    def add_df(self, df: DataFrame, col: str) -> int:
        """Insert keys (driver-side table mutation — sized for the small
        per-wave retry/insert volumes); returns count that failed."""
        failed = 0
        for r in self._rows(df, col):
            fp, i1 = int(r["fp"]), int(r["i1"])
            if not self._insert(fp, i1, self._alt(fp, i1)):
                failed += 1
        self._bc = None
        return failed

    def delete_df(self, df: DataFrame, col: str) -> int:
        removed = 0
        for r in self._rows(df, col):
            fp, i1 = int(r["fp"]), int(r["i1"])
            if self._delete(fp, i1, self._alt(fp, i1)):
                removed += 1
        self._bc = None
        return removed

    def _insert(self, fp: int, i1: int, i2: int) -> bool:
        for i in (i1, i2):
            slot = np.where(self.table[i] == 0)[0]
            if slot.size:
                self.table[i, slot[0]] = fp
                return True
        i = i1 if self._rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            s = int(self._rng.integers(self.SLOTS))
            fp, self.table[i, s] = int(self.table[i, s]), fp
            i = self._alt(fp, i)  # consistent alt of the kicked fp
            slot = np.where(self.table[i] == 0)[0]
            if slot.size:
                self.table[i, slot[0]] = fp
                return True
        return False

    def _delete(self, fp: int, i1: int, i2: int) -> bool:
        for i in (i1, i2):
            slot = np.where(self.table[i] == fp)[0]
            if slot.size:
                self.table[i, slot[0]] = 0
                return True
        return False

    def maybe_contains(self, key: Column) -> Column:
        if self._bc is None:
            self._bc = self.spark.sparkContext.broadcast(
                (self.table, self._fp_h, self.n)
            )
        bc = self._bc
        fp, i1 = self._derive_cols(key)
        packed = F.array(fp, i1)

        @F.pandas_udf(T.BooleanType())
        def probe(v: pd.Series) -> pd.Series:
            t, fp_h, n = bc.value
            mat = np.vstack(v.to_numpy())
            fps = mat[:, 0]
            i1s = mat[:, 1]
            i2s = (i1s ^ fp_h[fps]) & (n - 1)
            f16 = fps.astype(np.uint16)
            hit1 = (t[i1s] == f16[:, None]).any(axis=1)
            hit2 = (t[i2s] == f16[:, None]).any(axis=1)
            return pd.Series(hit1 | hit2)

        return probe(packed)
