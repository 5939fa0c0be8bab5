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
    per-micro-batch scheduling rounds. Restartable: the checkpoint dir
    remembers consumed files; ``seen``/``scheduled_log`` are plain parquet
    appends keyed by batch id."""
    from ..schemas import SEEDS

    seen_dir = f"{workdir}/seen"
    out_dir = f"{workdir}/scheduled_log"

    def round_fn(batch_df: DataFrame, batch_id: int) -> None:
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
            secs=F.lit(int(batch_id) * round_interval_s)
        )
        sched = schedule_round(fresh, host_policy, round_ts, salts=salts).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        sched.select(
            "batch_id", "canon_url", "url_hash", "host", "slot", "scheduled_ts"
        ).write.mode("append").parquet(out_dir)
        sched.select("url_hash", "canon_url").withColumn(
            "seen_round", F.col("url_hash").cast("int") * 0 + int(batch_id)
        ).write.mode("append").parquet(seen_dir)

    stream = spark.readStream.schema(SEEDS).parquet(seeds_dir)
    q = (
        stream.writeStream.foreachBatch(round_fn)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
