"""C2/J2 — the URL-seen set: partitioned Bloom shards + exact anti-join
(SURVEY.md §2.9 C2, §2.3 J2 — THE core operator).

Reference semantic preserved: exact ``set`` membership over processed items
(``validated_videos`` — ``enhanced_batch_processor.py:106,123,515-519,533``;
upload-history hash map — ``cloud_storage.py:241-279``). The north_rule
requires the final seen-set to be exact, so the Bloom layer is a **pre-filter
only**: bloom-negative candidates are definitely new (no false negatives);
bloom-positive survivors are decided by an exact ``left_anti`` join.

Layout for 10^10 URLs: the seen set is keyed by ``xxhash64(canon_url)`` and
sharded by ``pmod(url_hash, n_shards)``. Each shard materializes one Bloom
bitset row (packed numpy uint8). At 10 bits/key a 10^10-key set is ~12.5 GB
of bitsets — far too big to broadcast, but at 4096 shards each is ~3 MB, and
the probe is a **co-partitioned cogroup** on ``shard``: candidate *hashes*
(8 bytes each — nothing wider ever crosses the JVM<->Python boundary)
shuffle once by shard and meet exactly their shard's bitset; no bitset ever
replicates to every task, and only the bloom-positive hashes come back. The
exact check (semi join vs the seen set) runs only on that small positive
remainder (true dups + ~fpp of the new URLs), and the final anti-join is
against the resulting dup-key set — broadcastable at realistic dup rates —
never against the 10^10-row seen table itself.

All Python is Arrow-batched (applyInPandas / cogroup applyInPandas); the bit
math is numpy over whole columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BLOOM_SHARDS

_MASK63 = np.int64(0x7FFFFFFFFFFFFFFF)


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int):
    """Double hashing: pos_i = (h1 + i*h2) mod n_bits (classic Kirsch-
    Mitzenmacher construction)."""
    h = hashes.astype(np.int64) & _MASK63
    h1 = h % n_bits
    h2 = 1 + (h >> np.int64(17)) % (n_bits - 1)
    for i in range(n_hashes):
        yield (h1 + i * h2) % n_bits


def _build_bits(hashes: np.ndarray, n_bits: int, n_hashes: int) -> bytes:
    bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
    for pos in _positions(hashes, n_bits, n_hashes):
        np.bitwise_or.at(bits, (pos >> 3).astype(np.int64), np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits.tobytes()


def _probe_bits(hashes: np.ndarray, bits: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    hit = np.ones(len(hashes), dtype=bool)
    for pos in _positions(hashes, n_bits, n_hashes):
        byte = bits[(pos >> 3).astype(np.int64)]
        hit &= (byte & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return hit


def shard_of(url_hash_col, n_shards: int):
    return F.pmod(url_hash_col, F.lit(n_shards)).cast("int")


def build_bloom_shards(
    url_seen: DataFrame,
    n_shards: int = 64,
    bits_per_key: int = 10,
    n_hashes: int = 7,
    fixed_n_bits: int | None = None,
) -> DataFrame:
    """One Bloom bitset row per shard, built with a grouped pandas UDF
    (two-phase: partial per-partition hash lists never leave numpy).

    With ``fixed_n_bits`` every shard gets the same bitset width regardless
    of its key count — required for cross-round OR-merging
    (:func:`or_merge_bloom_shards`): size it for the shard's EXPECTED FINAL
    population (e.g. 10^10 keys / 4096 shards at 10 bits/key ≈ 3 MB/shard),
    not the current one. Without it, width adapts to the batch (one-shot
    builds)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        n_bits = fixed_n_bits or max(1024, int(len(hashes) * bits_per_key))
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "bits": [_build_bits(hashes, n_bits, n_hashes)],
                "n_items": [len(hashes)],
            }
        )

    keyed = url_seen.select(
        shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash"
    )
    return keyed.groupBy("shard").applyInPandas(build, schema=BLOOM_SHARDS)


def or_merge_bloom_shards(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Bitwise-OR per-shard merge of two shard tables built with the SAME
    ``fixed_n_bits``/``n_hashes`` — the incremental path (SCALE.md §1):
    each round ORs the delta's shards into the standing set instead of
    rebuilding from all 10^10 keys. Shards present on only one side pass
    through unchanged."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf
        widths = pdf["n_bits"].unique()
        assert len(widths) == 1, f"unmergeable shard widths {widths} (use fixed_n_bits)"
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        out = pdf.iloc[[0]].copy()
        out["bits"] = [acc.tobytes()]
        out["n_items"] = [int(pdf["n_items"].sum())]
        return out

    return old.unionByName(delta).groupBy("shard").applyInPandas(merge, schema=BLOOM_SHARDS)


def bloom_positive_hashes(
    candidate_hashes: DataFrame,
    bloom_shards: DataFrame,
    n_shards: int = 64,
) -> DataFrame:
    """``url_hash``es that MAY be seen, via a co-partitioned cogroup on
    shard. Bloom-negative hashes (the bulk, at realistic dup rates) never
    come back — they are definitely new.

    Only the 8-byte hash crosses the JVM<->Python Arrow boundary, in both
    directions: at 10^8 candidates that is ~1.6 GB of Arrow traffic instead
    of shipping full candidate rows (~100 B each) through Python twice.
    """

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            # no shard bitset => nothing can be seen: return no positives
            return pd.DataFrame({"url_hash": pd.Series([], dtype="int64")})
        hashes = left["url_hash"].to_numpy(dtype=np.int64)
        bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
        hit = _probe_bits(
            hashes, bits, int(right["n_bits"].iloc[0]), int(right["n_hashes"].iloc[0])
        )
        return pd.DataFrame({"url_hash": hashes[hit]})

    keyed = candidate_hashes.select(
        shard_of(F.col("url_hash"), n_shards).alias("_shard"), "url_hash"
    )
    return (
        keyed.groupBy("_shard")
        .cogroup(bloom_shards.groupBy("shard"))
        .applyInPandas(probe, schema="url_hash long")
    )


def bloom_prefilter(
    candidates: DataFrame,
    bloom_shards: DataFrame,
    n_shards: int = 64,
) -> DataFrame:
    """Adds ``maybe_seen BOOLEAN``: hash-join of the candidates against the
    bloom-positive hash set (skinny cogroup probe, JVM-side recombination).
    Candidates must carry ``url_hash``.

    Row-preserving: the probe input is made distinct so candidates that
    repeat a url_hash (normal raw-crawl input) join against at most ONE
    positive row each — without the distinct, k copies of a positive hash
    would fan the join out k×k."""
    positives = bloom_positive_hashes(
        candidates.select("url_hash").distinct(), bloom_shards, n_shards
    ).withColumn("_pos", F.lit(True))
    return candidates.join(positives, "url_hash", "left").withColumn(
        "maybe_seen", F.coalesce(F.col("_pos"), F.lit(False))
    ).drop("_pos")


def dedupe_against_seen(
    candidates: DataFrame,
    url_seen: DataFrame | None,
    bloom_shards: DataFrame | None = None,
    n_shards: int = 64,
    prefilter: str = "bloom",
) -> DataFrame:
    """The full J2 anti-join with an approximate pre-filter; result is
    EXACTLY the candidates not in url_seen (filter false positives cannot
    drop URLs: positives are re-checked by the exact anti-join; negatives
    skip it). ``prefilter`` selects the shard flavor for the passed
    ``bloom_shards`` table: "bloom" (default) or "cuckoo" (deletable —
    re-crawl-after-TTL; see operators/cuckoo.py). Both share the exactness
    contract: no false negatives reach the output.

    Also collapses within-batch duplicates (A5 — reference counts each path
    once, ``enhanced_batch_processor.py:533``): keep the highest-priority
    spelling per url_hash; tiebreaks extend through canon_url, raw url,
    and attempts (when present) so the survivor — including its non-key
    columns — is a pure function of the batch contents (north_rule), not
    of partition order.
    """
    # Total-tiebreak survivor rule applied UNCONDITIONALLY (north_rule:
    # the survivor, including non-key columns, is a pure function of the
    # batch contents, never of partition order — r2 verdict flagged the
    # old dropDuplicates fallback as partition-order-dependent). Priority
    # leads when present; every remaining orderable column joins the
    # tiebreak in name order so ties cannot survive to the row_number.
    leading = ["canon_url", "url", "attempts"]
    order = []
    if "priority" in candidates.columns:
        order.append(F.col("priority").desc())
    used = {"url_hash", "priority"}
    for name in leading:
        if name in candidates.columns:
            order.append(F.col(name).asc())
            used.add(name)
    for name, dtype in sorted(candidates.dtypes):
        # maps are unorderable at ANY nesting depth (array<map<...>>,
        # struct<...map...>) — substring match, not just top-level prefix
        if name in used or "map<" in dtype:
            continue
        order.append(F.col(name).asc_nulls_last())
    if not order:  # degenerate key-only frame: all rows per key identical
        order = [F.col("url_hash").asc()]
    w = Window.partitionBy("url_hash").orderBy(*order)
    in_batch = (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if url_seen is None:
        return in_batch
    seen_keys = url_seen.select("url_hash")
    if bloom_shards is None:
        return in_batch.join(seen_keys, "url_hash", "left_anti")
    # in_batch feeds two branches (the probe and the final anti-join), so
    # its window recomputes once per branch; measured A/B: a localCheckpoint
    # here is NOT a win — the checkpoint write of full rows costs more than
    # re-running the window over the (typically cached) candidate input
    # skinny probe: only hashes visit Python; the exact check (semi join vs
    # the seen set) runs on filter positives only — true dups + ~fpp of the
    # new URLs — so the big seen table is touched by a fraction of the
    # round, and the final anti-join is against that small dup-key set, not
    # against url_seen itself
    if prefilter == "cuckoo":
        from .cuckoo import cuckoo_positive_hashes

        positives = cuckoo_positive_hashes(
            in_batch.select("url_hash"), bloom_shards, n_shards=n_shards
        )
    else:
        positives = bloom_positive_hashes(
            in_batch.select("url_hash"), bloom_shards, n_shards=n_shards
        )
    # seen side LEFT: a left-semi join can only broadcast its RIGHT
    # (build) side, so `positives JOIN seen` forced a full shuffle of the
    # seen table every round — O(|seen|) exchange per probe. Flipped,
    # the batch-bounded positives set broadcasts and the seen table is
    # scanned IN PLACE (zero exchange of the big side); AQE falls back
    # to sort-merge only if positives outgrows the broadcast threshold.
    # Measured at 10^8 seen keys / 10^6 candidates, interleaved x3:
    # median 16.4s -> 6.5s (BENCH/BASELINE.md round-5 seen-set row).
    dup_keys = seen_keys.join(positives, "url_hash", "left_semi")
    return in_batch.join(dup_keys, "url_hash", "left_anti")
