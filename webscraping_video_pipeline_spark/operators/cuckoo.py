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
        T.StructField("counts", T.BinaryType(), False),  # uint16[n_buckets*4] per-slot multiplicity
        T.StructField("n_items", T.LongType(), False),
        T.StructField("n_evicted", T.LongType(), False),  # overflow drops (kept-maybe)
    ]
)

_SLOTS_PER_BUCKET = 4
_MAX_KICKS = 500
_COUNT_SAT = np.uint16(0xFFFF)  # saturated multiplicity: entry becomes undeletable


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the low bits (0 is the empty slot)."""
    f = (h & np.int64(0xFFFF)).astype(np.uint16)
    return np.where(f == 0, np.uint16(1), f)


def _bucket1(h: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((h >> np.int64(16)) & np.int64(0x7FFFFFFFFFFF)).astype(np.int64) % n_buckets


def _alt_bucket(b: np.ndarray, f: np.ndarray, n_buckets: int) -> np.ndarray:
    # partial-key displacement: b XOR (f * odd constant), masked to table
    # size. The XOR-mask pair is an involution ONLY for power-of-two
    # n_buckets (enforced in _Table/build_cuckoo_shards): with a non-pow2
    # modulus, relocated fingerprints would land in buckets contains()
    # never probes — silent false negatives past the exact-join backstop.
    return (b ^ (f.astype(np.int64) * np.int64(0x5BD1E995))) & (n_buckets - 1)


class _Table:
    """One shard's table: uint16[n_buckets, 4] fingerprints plus a parallel
    uint16 multiplicity per slot; deterministic kicks.

    The counts fix the delete-aliasing hazard: two distinct URLs may share
    one (bucket, fingerprint) entry, so a naive delete of one would un-see
    the other (a false negative that bypasses the exact-join backstop).
    Instead, inserting an already-present fingerprint increments its count
    and delete decrements, removing the entry only at zero. Counts saturate
    at 0xFFFF; a saturated entry is never removed (a permanent maybe-seen —
    false-positive direction only, which the exact join corrects)."""

    def __init__(
        self,
        n_buckets: int,
        slots: np.ndarray | None = None,
        counts: np.ndarray | None = None,
    ):
        assert n_buckets > 0 and (n_buckets & (n_buckets - 1)) == 0, (
            f"n_buckets must be a power of two (got {n_buckets}): the "
            "XOR alt-bucket map is only an involution for pow2 tables"
        )
        self.n_buckets = n_buckets
        self.slots = (
            slots.reshape(n_buckets, _SLOTS_PER_BUCKET).copy()
            if slots is not None
            else np.zeros((n_buckets, _SLOTS_PER_BUCKET), dtype=np.uint16)
        )
        if counts is not None:
            self.counts = counts.reshape(n_buckets, _SLOTS_PER_BUCKET).copy()
        else:
            # reconstructing from slots only (probe path): multiplicity 1
            # wherever a fingerprint sits
            self.counts = (self.slots != 0).astype(np.uint16)
        self.n_evicted = 0

    def _try_put(self, b: int, f: int, cnt: int) -> bool:
        row = self.slots[b]
        empties = np.flatnonzero(row == 0)
        if len(empties):
            row[empties[0]] = f
            self.counts[b, empties[0]] = np.uint16(cnt)
            return True
        return False

    def _bump(self, b: int, f: int, by: int = 1) -> bool:
        """Add ``by`` to the multiplicity of (b, f) if present (saturating)."""
        hits = np.flatnonzero(self.slots[b] == f)
        if len(hits):
            s = hits[0]
            self.counts[b, s] = np.uint16(min(int(self.counts[b, s]) + by, int(_COUNT_SAT)))
            return True
        return False

    def insert(self, h: int) -> None:
        f = int(_fingerprint(np.array([h], dtype=np.int64))[0])
        b1 = int(_bucket1(np.array([h], dtype=np.int64), self.n_buckets)[0])
        b2 = int(_alt_bucket(np.array([b1]), np.array([f], dtype=np.uint16), self.n_buckets)[0])
        if self._bump(b1, f) or self._bump(b2, f):
            return  # already present: count the extra occupant
        if self._try_put(b1, f, 1) or self._try_put(b2, f, 1):
            return
        # deterministic eviction walk: alternate slot index by kick counter;
        # the displaced entry carries its multiplicity with it
        b, cur, cur_cnt = b2, f, 1
        for kick in range(_MAX_KICKS):
            slot = kick % _SLOTS_PER_BUCKET
            cur, self.slots[b, slot] = int(self.slots[b, slot]), np.uint16(cur)
            cur_cnt, self.counts[b, slot] = int(self.counts[b, slot]), np.uint16(cur_cnt)
            b = int(_alt_bucket(np.array([b]), np.array([cur], dtype=np.uint16), self.n_buckets)[0])
            if self._bump(b, cur, by=cur_cnt) or self._try_put(b, cur, cur_cnt):
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
                s = hits[0]
                if self.counts[b, s] >= _COUNT_SAT:
                    return False  # saturated: undeletable by contract
                if self.counts[b, s] > 1:
                    self.counts[b, s] -= np.uint16(1)
                else:
                    row[s] = 0
                    self.counts[b, s] = np.uint16(0)
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
    assert n_buckets_per_shard > 0 and (n_buckets_per_shard & (n_buckets_per_shard - 1)) == 0, (
        f"n_buckets_per_shard must be a power of two (got {n_buckets_per_shard})"
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        t = _Table(n_buckets_per_shard)
        for h in np.sort(pdf["url_hash"].to_numpy(dtype=np.int64)):  # order-independent
            t.insert(int(h))
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_buckets": [n_buckets_per_shard],
                "slots": [t.slots.tobytes()],
                "counts": [t.counts.tobytes()],
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


def insert_into_cuckoo_shards(
    cuckoo_shards: DataFrame,
    new_urls: DataFrame,
    n_shards: int = 64,
    n_buckets_per_shard: int = 1 << 15,
) -> DataFrame:
    """Incremental per-round insert — the cuckoo analog of
    ``dedup.or_merge_bloom_shards``: each round's seen delta is inserted
    into the standing shard tables (O(delta) work) instead of rebuilding
    from the full 10^10-key set. Shards with no prior row are created at
    ``n_buckets_per_shard``; shards with no delta pass through unchanged.
    Deterministic: deltas are sorted before insertion and rounds arrive in
    order, so shard bytes are reproducible run-to-run."""
    assert n_buckets_per_shard > 0 and (n_buckets_per_shard & (n_buckets_per_shard - 1)) == 0

    def ins(shard_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        if shard_pdf.empty and new_pdf.empty:  # pragma: no cover
            return pd.DataFrame(columns=[f.name for f in CUCKOO_SHARDS.fields])
        if new_pdf.empty:
            return shard_pdf.iloc[[0]]
        if shard_pdf.empty:
            shard_id = int(new_pdf["shard"].iloc[0])
            t = _Table(n_buckets_per_shard)
            base_items = base_evicted = 0
        else:
            row = shard_pdf.iloc[0]
            shard_id = int(row["shard"])
            t = _Table(
                int(row["n_buckets"]),
                np.frombuffer(row["slots"], dtype=np.uint16),
                np.frombuffer(row["counts"], dtype=np.uint16),
            )
            base_items, base_evicted = int(row["n_items"]), int(row["n_evicted"])
        for h in np.sort(new_pdf["url_hash"].to_numpy(dtype=np.int64)):
            t.insert(int(h))
        return pd.DataFrame(
            {
                "shard": [shard_id],
                "n_buckets": [t.n_buckets],
                "slots": [t.slots.tobytes()],
                "counts": [t.counts.tobytes()],
                "n_items": [base_items + len(new_pdf)],
                "n_evicted": [base_evicted + t.n_evicted],
            }
        )

    keyed = new_urls.select(shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash")
    return (
        cuckoo_shards.groupBy("shard")
        .cogroup(keyed.groupBy("shard"))
        .applyInPandas(ins, schema=CUCKOO_SHARDS)
    )


def delete_from_cuckoo_shards(
    cuckoo_shards: DataFrame,
    expired: DataFrame,
    n_shards: int = 64,
) -> DataFrame:
    """Remove expired URLs (e.g. re-crawl after TTL) from the shards —
    the operation Bloom cannot do. Cogroup per shard; deterministic.

    Deletion is multiplicity-aware: an entry shared by k distinct inserts
    (fingerprint aliasing) survives k-1 deletions, so deleting one URL can
    never un-see another — the false-negative direction that would bypass
    the exact-join backstop is structurally excluded.

    Contract: only previously-inserted URLs may be deleted (the TTL use
    case guarantees this — expired URLs are a subset of seen URLs).
    Deleting a never-inserted key that aliases a live entry would consume
    that entry's multiplicity; within the contract, counts are exact
    (property-tested against a multiset oracle in tests/test_properties.py)."""

    def rm(shard_pdf: pd.DataFrame, exp_pdf: pd.DataFrame) -> pd.DataFrame:
        if shard_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in CUCKOO_SHARDS.fields])
        out = shard_pdf.iloc[[0]].copy()
        if exp_pdf.empty:
            return out
        t = _Table(
            int(out["n_buckets"].iloc[0]),
            np.frombuffer(out["slots"].iloc[0], dtype=np.uint16),
            np.frombuffer(out["counts"].iloc[0], dtype=np.uint16),
        )
        removed = sum(t.delete(int(h)) for h in np.sort(exp_pdf["url_hash"].to_numpy(dtype=np.int64)))
        out["slots"] = [t.slots.tobytes()]
        out["counts"] = [t.counts.tobytes()]
        out["n_items"] = [max(0, int(out["n_items"].iloc[0]) - removed)]
        return out

    keyed = expired.select(shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash")
    return (
        cuckoo_shards.groupBy("shard")
        .cogroup(keyed.groupBy("shard"))
        .applyInPandas(rm, schema=CUCKOO_SHARDS)
    )
