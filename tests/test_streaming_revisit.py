"""Streaming revisit-scheduler state ≡ batch q82 when fetch-observation
files land in timestamp order, plus replay idempotence of the
batch_id-partitioned delta state."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land_ts_slice(events_dir: str, spark, lo: int, hi: int, name: str) -> None:
    """Write the global-(ts, event_id)-rank slice [lo, hi) as one file —
    batches that respect time order, the streaming scheduler's contract."""
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    df = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
        .drop("rn")
        .coalesce(1)
    )
    tmp = f"{events_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(events_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{events_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _schedule_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_revisit_state_matches_batch_q82(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.graph import q82_revisit_scheduler
    from webscraping_video_pipeline_spark.streaming.revisit import (
        revisit_schedule,
        stream_revisit_state,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        _land_ts_slice(ev_dir, spark, cuts[i], cuts[i + 1], f"b{i}")
        stream_revisit_state(spark, ev_dir, wd)

    got = _schedule_rows(revisit_schedule(spark, wd))
    want = _schedule_rows(q82_revisit_scheduler(spark, SF))
    assert got == want
    # the state really is incremental: three delta partitions, and the
    # cross-batch boundary contributed changes (a URL's value stream does
    # not reset at a file boundary)
    state = spark.read.parquet(f"{wd}/revisit_state")
    assert state.select("batch_id").distinct().count() == 3
    later = state.filter(F.col("batch_id") > 0).agg(
        F.sum("d_changes").alias("c")
    ).collect()[0]["c"]
    assert later > 0


def test_stream_revisit_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.revisit import (
        revisit_schedule,
        stream_revisit_state,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    _land_ts_slice(ev_dir, spark, 0, n // 2, "b0")
    stream_revisit_state(spark, ev_dir, wd)
    before = _schedule_rows(revisit_schedule(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed state partition
    shutil.rmtree(f"{wd}/ckpt")
    stream_revisit_state(spark, ev_dir, wd)
    after = _schedule_rows(revisit_schedule(spark, wd))
    assert after == before, "replayed batch double-applied its counters"
