"""C2 (alternative) — partitioned cuckoo-filter URL-seen shards.

The north_star names "partitioned Bloom/cuckoo filters" for the URL-seen
set; ``dedup.py`` provides the Bloom default, this module the cuckoo
variant. Same sharding layout and same exactness contract (approximate
prefilter, exact semi/anti-join backstop decides), same skinny-hash
cogroup probe. What cuckoo adds over Bloom:

- **deletion** (``delete_from_cuckoo_shards``): a URL can be un-seen —
  the re-crawl-after-TTL semantic the reference approximates by clearing
  its JSON seen-state between batches
  (``enhanced_batch_processor.py:126-143`` rewrites state wholesale);
- bounded ~0.955 load factor with 4-slot buckets and 16-bit fingerprints
  (~fpp 2^-13 x 8), vs Bloom's width fixed at build time.

Implementation: partial-key cuckoo hashing (Fan et al., CoNEXT'14 —
public algorithm): item -> 16-bit fingerprint f; bucket1 = h(x); bucket2 =
bucket1 XOR h(f). Eviction walk is DETERMINISTIC (slot chosen by walk
counter, not RNG) so shard bytes are reproducible run-to-run — the same
determinism rule as everything else in the engine.

All numpy over whole columns inside Arrow-batched grouped UDFs; one shard
row per ``pmod(url_hash, n_shards)`` exactly like the Bloom shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUCKOO_SHARDS = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_buckets", T.IntegerType(), False),
        T.StructField("slots", T.BinaryType(), False),  # uint16[n_buckets*4]
        T.StructField("n_items", T.LongType(), False),
        T.StructField("n_evicted", T.LongType(), False),  # overflow drops (kept-maybe)
    ]
)

_SLOTS_PER_BUCKET = 4
_MAX_KICKS = 500


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the low bits (0 is the empty slot)."""
    f = (h & np.int64(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((h >> np.int64(16)) & np.int64(0x7FFFFFFFFFFF)).astype(np.int64) % n_buckets


def _alt_bucket(b: np.ndarray, f: np.ndarray, n_buckets: int) -> np.ndarray:
    # partial-key displacement: b XOR (f * odd constant), mod table size
    return (b ^ (f.astype(np.int64) * np.int64(0x5BD1E995))) % n_buckets


class _Table:
    """One shard's table: uint16[n_buckets, 4]; deterministic kicks."""

    def __init__(self, n_buckets: int, slots: np.ndarray | None = None):
        self.n_buckets = n_buckets
        self.slots = (
            slots.reshape(n_buckets, _SLOTS_PER_BUCKET).copy()
            if slots is not None
            else np.zeros((n_buckets, _SLOTS_PER_BUCKET), dtype=np.uint16)
        )
        self.n_evicted = 0

    def _try_put(self, b: int, f: int) -> bool:
        row = self.slots[b]
        empties = np.flatnonzero(row == 0)
        if len(empties):
            row[empties[0]] = f
            return True
        return False

    def insert(self, h: int) -> None:
        f = int(_fingerprint(np.array([h], dtype=np.int64))[0])
        b1 = int(_bucket1(np.array([h], dtype=np.int64), self.n_buckets)[0])
        b2 = int(_alt_bucket(np.array([b1]), np.array([f], dtype=np.uint16), self.n_buckets)[0])
        if f in self.slots[b1] or f in self.slots[b2]:
            return  # already present (per-fingerprint dedup is fine: prefilter only)
        if self._try_put(b1, f) or self._try_put(b2, f):
            return
        # deterministic eviction walk: alternate slot index by kick counter
        b, cur = b2, f
        for kick in range(_MAX_KICKS):
            slot = kick % _SLOTS_PER_BUCKET
            cur, self.slots[b, slot] = int(self.slots[b, slot]), np.uint16(cur)
            b = int(_alt_bucket(np.array([b]), np.array([cur], dtype=np.uint16), self.n_buckets)[0])
            if self._try_put(b, cur):
                return
        self.n_evicted += 1  # table full: the walked-out fingerprint is dropped

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        f = _fingerprint(hashes)
        b1 = _bucket1(hashes, self.n_buckets)
        b2 = _alt_bucket(b1, f, self.n_buckets)
        in1 = (self.slots[b1] == f[:, None]).any(axis=1)
        in2 = (self.slots[b2] == f[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, h: int) -> bool:
        f = int(_fingerprint(np.array([h], dtype=np.int64))[0])
        for b in (
            int(_bucket1(np.array([h], dtype=np.int64), self.n_buckets)[0]),
            None,
        ):
            if b is None:
                b1 = int(_bucket1(np.array([h], dtype=np.int64), self.n_buckets)[0])
                b = int(_alt_bucket(np.array([b1]), np.array([f], dtype=np.uint16), self.n_buckets)[0])
            row = self.slots[b]
            hits = np.flatnonzero(row == f)
            if len(hits):
                row[hits[0]] = 0
                return True
        return False


def shard_of(url_hash_col, n_shards: int):
    return F.pmod(url_hash_col, F.lit(n_shards)).cast("int")


def build_cuckoo_shards(
    url_seen: DataFrame,
    n_shards: int = 64,
    n_buckets_per_shard: int = 1 << 15,
) -> DataFrame:
    """One cuckoo table row per shard (capacity ≈ n_buckets*4*0.95 keys)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        t = _Table(n_buckets_per_shard)
        for h in np.sort(pdf["url_hash"].to_numpy(dtype=np.int64)):  # order-independent
            t.insert(int(h))
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_buckets": [n_buckets_per_shard],
                "slots": [t.slots.tobytes()],
                "n_items": [len(pdf)],
                "n_evicted": [t.n_evicted],
            }
        )

    keyed = url_seen.select(shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash")
    return keyed.groupBy("shard").applyInPandas(build, schema=CUCKOO_SHARDS)


def cuckoo_positive_hashes(
    candidate_hashes: DataFrame,
    cuckoo_shards: DataFrame,
    n_shards: int = 64,
) -> DataFrame:
    """Skinny-hash cogroup probe, mirroring ``bloom_positive_hashes``.

    CAUTION: a shard that overflowed (n_evicted > 0) has dropped
    fingerprints, which would be FALSE NEGATIVES — those shards degrade to
    all-positive (exact join decides), preserving the exactness contract.
    """

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        hashes = left["url_hash"].to_numpy(dtype=np.int64)
        if int(right["n_evicted"].iloc[0]) > 0:
            return pd.DataFrame({"url_hash": hashes})  # degraded: check all
        t = _Table(
            int(right["n_buckets"].iloc[0]),
            np.frombuffer(right["slots"].iloc[0], dtype=np.uint16),
        )
        return pd.DataFrame({"url_hash": hashes[t.contains(hashes)]})

    keyed = candidate_hashes.select(
        shard_of(F.col("url_hash"), n_shards).alias("_shard"), "url_hash"
    )
    return (
        keyed.groupBy("_shard")
        .cogroup(cuckoo_shards.groupBy("shard"))
        .applyInPandas(probe, schema="url_hash long")
    )


def delete_from_cuckoo_shards(
    cuckoo_shards: DataFrame,
    expired: DataFrame,
    n_shards: int = 64,
) -> DataFrame:
    """Remove expired URLs (e.g. re-crawl after TTL) from the shards —
    the operation Bloom cannot do. Cogroup per shard; deterministic."""

    def rm(shard_pdf: pd.DataFrame, exp_pdf: pd.DataFrame) -> pd.DataFrame:
        if shard_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in CUCKOO_SHARDS.fields])
        out = shard_pdf.iloc[[0]].copy()
        if exp_pdf.empty:
            return out
        t = _Table(
            int(out["n_buckets"].iloc[0]),
            np.frombuffer(out["slots"].iloc[0], dtype=np.uint16),
        )
        removed = sum(t.delete(int(h)) for h in np.sort(exp_pdf["url_hash"].to_numpy(dtype=np.int64)))
        out["slots"] = [t.slots.tobytes()]
        out["n_items"] = [max(0, int(out["n_items"].iloc[0]) - removed)]
        return out

    keyed = expired.select(shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash")
    return (
        cuckoo_shards.groupBy("shard")
        .cogroup(keyed.groupBy("shard"))
        .applyInPandas(rm, schema=CUCKOO_SHARDS)
    )
