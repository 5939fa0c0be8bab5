"""C2/J2 — Bloom-accelerated exact dedup: no false negatives ever, exact
result equals the plain anti-join (the north_rule seen-set-exactness check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.operators.dedup import (
    bloom_prefilter,
    build_bloom_shards,
    dedupe_against_seen,
)


def _candidates(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("https://h/"), F.col("id")).alias("canon_url"),
        F.xxhash64(F.concat(F.lit("https://h/"), F.col("id"))).alias("url_hash"),
        (1.0 / (1 + F.pmod(F.col("id"), F.lit(97)))).alias("priority"),
    )


def _seen(spark, n=500, stride=3):
    return (
        spark.range(0, n, stride)
        .select(
            F.xxhash64(F.concat(F.lit("https://h/"), F.col("id"))).alias("url_hash"),
            F.concat(F.lit("https://h/"), F.col("id")).alias("canon_url"),
            F.lit(0).alias("seen_round"),
        )
    )


def test_bloom_no_false_negatives(spark):
    seen = _seen(spark)
    shards = build_bloom_shards(seen, n_shards=8)
    flagged = bloom_prefilter(_candidates(spark), shards, n_shards=8)
    # every truly-seen candidate must be flagged maybe_seen
    truly_seen = flagged.join(seen.select("url_hash"), "url_hash", "left_semi")
    assert truly_seen.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_dedup_matches_exact_antijoin(spark):
    cands, seen = _candidates(spark), _seen(spark)
    shards = build_bloom_shards(seen, n_shards=8)
    with_bloom = dedupe_against_seen(cands, seen, shards, n_shards=8)
    exact = dedupe_against_seen(cands, seen, None)
    got = sorted(r.url_hash for r in with_bloom.select("url_hash").collect())
    want = sorted(r.url_hash for r in exact.select("url_hash").collect())
    assert got == want and len(want) > 0


def test_within_batch_dedup_keeps_best_priority(spark):
    dup = spark.createDataFrame(
        [
            ("https://h/a", 1, 0.2),
            ("https://h/a", 1, 0.9),
            ("https://h/b", 2, 0.5),
        ],
        "canon_url string, url_hash long, priority double",
    )
    out = dedupe_against_seen(dup, None)
    rows = {r.url_hash: r.priority for r in out.collect()}
    assert rows == {1: 0.9, 2: 0.5}


def test_no_url_twice_across_rounds(spark, pages, seeds, host_policy, robots_cache, workdir):
    """Property: across committed rounds, each url_hash is fetched at most once."""
    from webscraping_video_pipeline_spark.plans.crawl import CrawlConfig, CrawlEngine

    eng = CrawlEngine(
        spark, workdir, pages, seeds, host_policy, robots_cache,
        CrawlConfig(n_shards=8, salts=4),
    )
    eng.run(3)
    log = eng.catalog.read_appended("fetch_log")
    total = log.count()
    distinct = log.select("url_hash").distinct().count()
    # misses may retry (expected); fetched urls must never repeat
    fetched = log.filter(F.col("status") == "fetched")
    assert fetched.count() == fetched.select("url_hash").distinct().count()
    assert total >= distinct


def test_or_merged_shards_equal_full_rebuild(spark):
    """Incremental OR-merge (delta shards | standing shards) admits exactly
    the same membership as a one-shot build over the union — same fixed
    width ⇒ identical bitsets ⇒ identical prefilter decisions."""
    from webscraping_video_pipeline_spark.operators.dedup import (
        or_merge_bloom_shards,
    )

    a = _seen(spark, n=300, stride=3)
    b = _seen(spark, n=600, stride=5).filter(F.col("url_hash").isNotNull())
    kw = dict(n_shards=8, fixed_n_bits=1 << 14)
    merged = or_merge_bloom_shards(
        build_bloom_shards(a, **kw), build_bloom_shards(b, **kw)
    )
    full = build_bloom_shards(a.unionByName(b), **kw)
    got = {r.shard: r.bits for r in merged.collect()}
    want = {r.shard: r.bits for r in full.collect()}
    assert got == want
