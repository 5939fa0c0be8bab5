"""Streaming frontier ingestion: readStream + foreachBatch, micro-batch =
crawl round (SURVEY §2.10 row 1).

Reference semantic preserved: results are processed as they arrive off the
scraper queue while producers still run
(``parallel_scraper_manager.py:356-411``); here newly discovered seed
files land in a directory, Structured Streaming picks them up, and each
micro-batch runs the scheduling front half of a crawl round — canonicalize
-> dedupe against the accumulated seen set -> politeness slots — appending
its decisions to ``scheduled_log`` and its URLs to the cross-batch seen
state. The batch round loop (``plans/crawl.py``) stays the reproducibility
reference; this is the low-latency ingestion twin built on the same
operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedupe_against_seen
from ..operators.politeness import schedule_round
from ..plans.crawl import BASE_ROUND_TS, canonicalize_candidates


def stream_frontier_rounds(
    spark: SparkSession,
    seeds_dir: str,
    workdir: str,
    host_policy: DataFrame,
    round_interval_s: int = 3600,
    salts: int = 4,
) -> None:
    """Drain all available seed files (trigger availableNow) through
    per-micro-batch scheduling rounds. Restartable AND idempotent:
    foreachBatch gives at-least-once delivery, so both sinks are
    partitioned by ``batch_id`` and written with dynamic-partition
    overwrite — a replayed batch_id rewrites its own partition instead of
    appending duplicates. The seen-side partition doubles as the commit
    marker (it is written last): a batch whose seen partition exists is
    fully committed and is skipped on replay, preserving the
    no-URL-scheduled-twice invariant across crash/restart."""
    from ..schemas import SEEDS

    seen_dir = f"{workdir}/seen"
    out_dir = f"{workdir}/scheduled_log"

    def round_fn(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        seen_part = f"{seen_dir}/batch_id={bid}"
        if os.path.isdir(seen_part) and os.listdir(seen_part):
            return  # batch already fully committed (at-least-once replay)
        cands = canonicalize_candidates(batch_df, "url").withColumn(
            "priority", F.coalesce(F.col("priority"), F.lit(0.0))
        )
        seen = (
            spark.read.parquet(seen_dir)
            if os.path.isdir(seen_dir) and os.listdir(seen_dir)
            else None
        )
        fresh = dedupe_against_seen(cands, seen, None)
        round_ts = F.lit(BASE_ROUND_TS).cast("timestamp") + F.make_interval(
            secs=F.lit(bid * round_interval_s)
        )
        sched = schedule_round(fresh, host_policy, round_ts, salts=salts).withColumn(
            "batch_id", F.lit(bid).cast("long")
        )
        # scheduled_log first, seen last: a crash between the two leaves the
        # commit marker absent, so the replay rewrites both partitions
        (
            sched.select(
                "canon_url", "url_hash", "host", "slot", "scheduled_ts", "batch_id"
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )
        (
            sched.select(
                "url_hash",
                "canon_url",
                F.lit(bid).cast("int").alias("seen_round"),
                "batch_id",
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(seen_dir)
        )

    stream = spark.readStream.schema(SEEDS).parquet(seeds_dir)
    q = (
        stream.writeStream.foreachBatch(round_fn)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
