"""Distributed URL-seen set (J2): per-partition bloom filters over
canonicalized+hashed URLs + an exact anti-join (north_rule).

Replaces the reference's ``ConcurrentHashSet`` visited sets
(``Crawler.fs:190,290-291,314,320``). Three scopes exist (quirk Q11):
global seed scope and per-company extractor scope — encoded in one 64-bit
``seen_key = xxhash64(scope, canonical_url)``.

Architecture (SURVEY.md §4 strategy 2):
- the EXACT anti-join against the persisted ``url_seen`` table is the
  correctness anchor — the bloom layer only prunes work;
- blooms are built per hash-bucket (``pmod(seen_key, n_buckets)``) with
  ``applyInPandas`` (numpy bit array, double hashing), persisted beside the
  snapshot so a restart reuses them;
- candidates probe the bloom of their own bucket via a broadcast dict;
  bloom-negatives are *definitely new* and skip the exact probe entirely —
  at 10^10 URLs the anti-join input shrinks to the tiny positive slice.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 7
BLOOM_BITS_PER_KEY = 12  # ~0.3% false-positive rate at k=7


def seen_key(scope_col, canonical_url_col):
    """64-bit scoped membership key."""
    return F.xxhash64(scope_col, canonical_url_col)


def _bloom_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, BLOOM_K) bit positions via double hashing of the 64-bit key.
    Deterministic, endian-free, pure numpy."""
    h1 = keys.astype(np.uint64)
    # splitmix64-style second hash
    z = (h1 + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h2 = (z ^ (z >> np.uint64(27))) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return pos


def _bloom_build(keys: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(keys):
        pos = _bloom_positions(keys, m_bits)
        np.bitwise_or.at(bits, (pos // 8).ravel(), (1 << (pos % 8)).astype(np.uint8).ravel())
    return bits.tobytes()


def _bloom_probe(keys: np.ndarray, bloom: bytes, m_bits: int) -> np.ndarray:
    """Boolean array: True = maybe-seen (must verify), False = definitely new."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(bloom, dtype=np.uint8)
    pos = _bloom_positions(keys, m_bits)
    byte = bits[(pos // 8)]
    hit = (byte & (1 << (pos % 8)).astype(np.uint8)) != 0
    return hit.all(axis=1)


class UrlSeen:
    """In-session handle over the url_seen table + its bucket blooms.

    The table itself lives in the snapshot store (parquet); this class only
    defines the plan fragments.
    """

    def __init__(self, spark, n_buckets: int = 64):
        if n_buckets & (n_buckets - 1):
            # power of two keeps numpy's uint64 modulo consistent with
            # Spark's pmod on signed keys (2^64 % n == 0)
            raise ValueError("n_buckets must be a power of two")
        self.spark = spark
        self.n_buckets = n_buckets
        self._blooms: Optional[Dict[int, bytes]] = None
        self._m_bits: int = 0

    # -- bloom lifecycle ---------------------------------------------------

    def build_blooms(self, seen: DataFrame) -> None:
        """Collect per-bucket blooms to the driver (each bucket's filter is
        KB-scale; 10^10 keys / 64k buckets × 12 bits ≈ 230 KB per bucket —
        on a real cluster these stay distributed via join instead; the
        broadcast-dict variant is the local-mode fast path)."""
        n = seen.count()
        m_bits = max(1 << 14, int(n * BLOOM_BITS_PER_KEY // max(1, self.n_buckets)))
        rows = (
            seen.select(
                F.pmod(F.col("seen_key"), F.lit(self.n_buckets)).alias("bucket"),
                "seen_key",
            )
            .groupBy("bucket")
            .agg(F.collect_list("seen_key").alias("keys"))
            .collect()
        )
        self._blooms = {
            r["bucket"]: _bloom_build(np.array(r["keys"], dtype=np.int64), m_bits)
            for r in rows
        }
        self._m_bits = m_bits

    # -- the anti-join -----------------------------------------------------

    def filter_unseen(self, candidates: DataFrame, seen: DataFrame) -> DataFrame:
        """candidates(…, seen_key) → rows whose key is NOT in ``seen``.

        Bloom-prefilter (when built) splits candidates into definite-new
        (pass through, no shuffle) and maybe-seen (exact left_anti join).
        Without blooms, falls back to the plain exact anti-join.
        """
        if not self._blooms:
            return candidates.join(
                seen.select("seen_key").distinct(), "seen_key", "left_anti"
            )

        import pandas as pd

        blooms = self.spark.sparkContext.broadcast((self._blooms, self._m_bits, self.n_buckets))

        def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            bl, m_bits, n_buckets = blooms.value
            for b in batches:
                keys = b["seen_key"].to_numpy(dtype=np.int64)
                buckets = (keys.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
                maybe = np.zeros(len(b), dtype=bool)
                for bucket in np.unique(buckets):
                    bloom = bl.get(int(bucket))
                    mask = buckets == bucket
                    if bloom is None:
                        continue  # empty bucket → all definitely new
                    maybe[mask] = _bloom_probe(
                        keys[mask].astype(np.uint64), bloom, m_bits
                    )
                out = b.copy()
                out["maybe_seen"] = maybe
                yield out

        from pyspark.sql import types as T

        # never mutate df.schema (it's cached on the DataFrame) — build fresh
        probed_schema = T.StructType(
            list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
        )
        probed = candidates.mapInPandas(probe, schema=probed_schema)
        definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        needs_check = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        verified_new = needs_check.join(
            seen.select("seen_key").distinct(), "seen_key", "left_anti"
        )
        return definite_new.unionByName(verified_new)
