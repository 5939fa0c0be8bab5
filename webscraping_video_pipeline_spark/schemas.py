"""Explicit StructTypes for every engine table — no schema inference.

The reference keeps a hand-maintained dict contract per record (every scraper
emits the same keys; enforced only by a test asserting required fields —
reference ``tests/validation_test.py:50-56``). We make the contract explicit:
one StructType per table, used by both the synthetic generator and the engine.

Authoritative input shape (BASELINE.json ``input_hint``)::

    pages: url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- input table
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # golden extraction oracle
        T.StructField("lang", T.StringType(), True),
    ]
)

# ------------------------------------------------------------- frontier tables
# Initial frontier. priority mirrors the reference's popularity ordering
# (internet_archive_scraper.py:76 sorts `downloads desc`); source mirrors the
# 8 registered scrapers (reference main.py:158-167).
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("discovered_ts", T.TimestampType(), False),
    ]
)

# Live frontier rows (seeds + discovered outlinks, canonicalized + hashed).
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(canon_url)
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("discovered_ts", T.TimestampType(), True),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("next_attempt_round", T.IntegerType(), False),
    ]
)

# Exact URL-seen set (ground truth; the Bloom shards are a pre-filter only —
# reference semantic: `validated_videos: set[str]`,
# enhanced_batch_processor.py:106,123,515-519,533).
URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("seen_round", T.IntegerType(), False),
    ]
)

# Mirrors the driver testdata `documents` table (streaming corpus source).
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# Per-shard Bloom filters over url_hash, sharded by pmod(url_hash, n_shards).
BLOOM_SHARDS = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_bits", T.IntegerType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),  # packed numpy bitset
        T.StructField("n_items", T.LongType(), False),
    ]
)

# Per-host politeness policy (reference: per-source request_delay,
# config.py:15-72; nasa 3.6s nasa_scraper.py:41; circuit breaker
# parallel_scraper_manager.py:171-178).
HOST_POLICY = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), False),
        T.StructField("bucket_capacity", T.IntegerType(), False),
        T.StructField("max_errors", T.IntegerType(), False),
    ]
)

# robots.txt cache snapshots (two snapshots/host → exercises the as-of join).
ROBOTS_CACHE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("fetched_ts", T.TimestampType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_s", T.DoubleType(), True),
    ]
)

# Per-round fetch log (reference analog: download results + upload history,
# cloud_storage.py:281-330).
FETCH_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("scheduled_ts", T.TimestampType(), False),
        T.StructField("slot", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # fetched | miss
    ]
)

# Extracted output (the engine's "validated upload").
EXTRACTED = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
    ]
)

# Per-partition lineage + metrics, checkpointed each round (north_rule;
# reference analog scraper_status / batch_state counters,
# parallel_scraper_manager.py:77-84, enhanced_batch_processor.py:318-340).
ROUND_METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("t_ms", T.DoubleType(), False),
    ]
)
