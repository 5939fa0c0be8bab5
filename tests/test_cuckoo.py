"""C2 alternative — cuckoo-filter URL-seen shards: no false negatives,
probe parity with exact membership, deletion (the Bloom-can't feature),
and overflow degradation that preserves the exactness contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.operators.cuckoo import (
    _Table,
    build_cuckoo_shards,
    cuckoo_positive_hashes,
    delete_from_cuckoo_shards,
)

N_SHARDS = 8


def _seen(spark, n=2000, stride=3):
    return spark.range(0, n, stride).select(
        F.xxhash64(F.concat(F.lit("https://h/"), F.col("id"))).alias("url_hash")
    )


def _cands(spark, n=2000):
    return spark.range(n).select(
        F.xxhash64(F.concat(F.lit("https://h/"), F.col("id"))).alias("url_hash")
    )


def test_no_false_negatives_and_probe_parity(spark):
    seen, cands = _seen(spark), _cands(spark)
    shards = build_cuckoo_shards(seen, n_shards=N_SHARDS, n_buckets_per_shard=1 << 10)
    assert shards.agg(F.sum("n_evicted")).collect()[0][0] == 0
    pos = set(
        r.url_hash
        for r in cuckoo_positive_hashes(cands, shards, n_shards=N_SHARDS).collect()
    )
    truly = set(r.url_hash for r in seen.collect())
    assert truly <= pos  # every seen hash flagged (no false negatives)
    # false-positive rate sane for 16-bit fingerprints
    n_new = cands.count() - len(truly)
    fp = len(pos - truly)
    assert fp / max(1, n_new) < 0.01


def test_delete_unseens_a_url(spark):
    seen = _seen(spark, n=900, stride=1)
    shards = build_cuckoo_shards(seen, n_shards=N_SHARDS, n_buckets_per_shard=1 << 10).cache()
    victim = seen.limit(7)
    after = delete_from_cuckoo_shards(shards, victim, n_shards=N_SHARDS)
    pos = set(
        r.url_hash
        for r in cuckoo_positive_hashes(seen, after, n_shards=N_SHARDS).collect()
    )
    gone = set(r.url_hash for r in victim.collect())
    assert not (gone & pos)  # deleted hashes no longer flagged
    kept = set(r.url_hash for r in seen.collect()) - gone
    assert kept <= pos  # everything else still flagged


def test_overflow_degrades_to_all_positive():
    # tiny table forced past capacity: evictions recorded, probe then
    # reports EVERYTHING as maybe-seen (exact join decides) instead of
    # risking a false negative
    t = _Table(4)  # capacity 16
    hashes = np.arange(1, 200, dtype=np.int64) * 2654435761
    for h in hashes:
        t.insert(int(h))
    assert t.n_evicted > 0


def test_delete_aliased_fingerprints_keeps_other_url():
    # two distinct hashes sharing one (bucket, fingerprint) entry: deleting
    # one must NOT un-see the other (multiplicity-counted slots)
    h1 = (1 << 16) | 5  # bucket1 = 1, fingerprint = 5
    h2 = (5 << 16) | 5  # bucket1 = 5 % 4 = 1, fingerprint = 5  (aliases h1)
    t = _Table(4)
    t.insert(h1)
    t.insert(h2)
    both = np.array([h1, h2], dtype=np.int64)
    assert t.contains(both).all()
    assert t.delete(h1)
    assert t.contains(both).all()  # h2's evidence survives h1's deletion
    assert t.delete(h2)
    assert not t.contains(both).any()


def test_non_pow2_buckets_rejected():
    import pytest

    with pytest.raises(AssertionError):
        _Table(12)


def test_incremental_insert_equals_full_build_membership(spark):
    """insert_into_cuckoo_shards over two deltas flags exactly the same
    members as a one-shot build over their union (no false negatives)."""
    from webscraping_video_pipeline_spark.operators.cuckoo import (
        insert_into_cuckoo_shards,
    )

    d1 = _seen(spark, n=600, stride=2)   # even ids
    d2 = _seen(spark, n=601, stride=3)   # multiples of 3 (overlaps d1)
    full = d1.unionByName(d2)
    incr = insert_into_cuckoo_shards(
        build_cuckoo_shards(d1, n_shards=N_SHARDS, n_buckets_per_shard=1 << 10),
        d2,
        n_shards=N_SHARDS,
        n_buckets_per_shard=1 << 10,
    )
    cands = _cands(spark, n=1200)
    pos = {r.url_hash for r in cuckoo_positive_hashes(cands, incr, n_shards=N_SHARDS).collect()}
    truly = {r.url_hash for r in full.collect()}
    assert truly <= pos  # every member of either delta still flagged


def test_crawl_with_cuckoo_filter_matches_bloom(spark, pages, seeds, host_policy, robots_cache, tmp_path):
    """The crawl is filter-agnostic: bloom and cuckoo prefilters produce
    identical fetch_log + url_seen (the exact-join backstop decides)."""
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.plans.crawl import CrawlConfig, CrawlEngine

    logs = {}
    for kind in ("bloom", "cuckoo"):
        cfg = CrawlConfig(
            n_shards=8, salts=4, seen_filter=kind,
            cuckoo_buckets_per_shard=1 << 10,
        )
        eng = CrawlEngine(
            spark, str(tmp_path / kind), pages, seeds, host_policy, robots_cache, cfg
        )
        eng.run(3)
        logs[kind] = {
            "fetch": sorted(
                (r["round"], r["canon_url"], r["slot"], r["status"])
                for r in eng.catalog.read_appended("fetch_log").collect()
            ),
            "seen": sorted(
                r["url_hash"] for r in eng.catalog.read_appended("url_seen").collect()
            ),
        }
    assert logs["bloom"]["fetch"] == logs["cuckoo"]["fetch"]
    assert logs["bloom"]["seen"] == logs["cuckoo"]["seen"]


def test_expire_seen_before_enables_recrawl(spark, pages, seeds, host_policy, robots_cache, tmp_path):
    """TTL expiry: URLs seen in round 0 are forgotten — dropped from
    url_seen and un-flagged by the prefilter — so the dedupe passes them
    through again. Cuckoo takes the O(expired)-delete path; bloom rebuilds."""
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.operators.dedup import dedupe_against_seen
    from webscraping_video_pipeline_spark.plans.crawl import CrawlConfig, CrawlEngine

    for kind in ("cuckoo", "bloom"):
        cfg = CrawlConfig(
            n_shards=8, salts=4, seen_filter=kind, cuckoo_buckets_per_shard=1 << 10
        )
        eng = CrawlEngine(
            spark, str(tmp_path / kind), pages, seeds, host_policy, robots_cache, cfg
        )
        eng.run(2)
        seen = eng.catalog.read_appended("url_seen")
        round0 = seen.filter(F.col("seen_round") == 0)
        n_round0 = round0.count()
        round0_rows = round0.select("url_hash", "canon_url").collect()
        assert n_round0 > 0

        out = eng.expire_seen_before(1)
        assert out["n_expired"] == n_round0

        remaining = eng.catalog.read_appended("url_seen")
        assert remaining.filter(F.col("seen_round") == 0).count() == 0

        # expired URLs now pass the full dedupe (prefilter + exact backstop)
        revisit = spark.createDataFrame(
            [(r["url_hash"], r["canon_url"]) for r in round0_rows],
            "url_hash long, canon_url string",
        )
        shards = eng.catalog.read_snapshot(f"{kind}_shards")
        fresh = dedupe_against_seen(
            revisit, remaining, shards, n_shards=cfg.n_shards, prefilter=kind
        )
        assert fresh.count() == n_round0


def test_build_deterministic(spark):
    seen = _seen(spark, n=1500, stride=2)
    a = {r.shard: r.slots for r in build_cuckoo_shards(seen, n_shards=N_SHARDS, n_buckets_per_shard=1 << 10).collect()}
    b = {r.shard: r.slots for r in build_cuckoo_shards(seen, n_shards=N_SHARDS, n_buckets_per_shard=1 << 10).collect()}
    assert a == b
