"""Streaming AIMD rate state ≡ batch q94 when outcome files land in
timestamp order, plus replay idempotence and an explicit carried-rate
boundary pin (an error's halving must survive into the next batch's
fold as its initial accumulator)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land_ts_slice(events_dir: str, spark, lo: int, hi: int, name: str) -> None:
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_aimd_matches_batch_q94(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        q94_aimd_rate_control,
    )
    from webscraping_video_pipeline_spark.streaming.aimd import (
        current_rates,
        stream_aimd_rates,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        _land_ts_slice(ev_dir, spark, cuts[i], cuts[i + 1], f"b{i}")
        stream_aimd_rates(spark, ev_dir, wd)

    got = _rows(current_rates(spark, wd))
    want = _rows(q94_aimd_rate_control(spark, SF))
    assert got == want
    parts = [p for p in os.listdir(f"{wd}/aimd_state") if p.startswith("batch_id=")]
    assert len(parts) == 3


def test_stream_aimd_replay_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.aimd import (
        _batch_delta,
        _state_tail,
        current_rates,
        stream_aimd_rates,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    _land_ts_slice(ev_dir, spark, 0, n // 2, "b0")
    stream_aimd_rates(spark, ev_dir, wd)
    _land_ts_slice(ev_dir, spark, n // 2, n, "b1")
    stream_aimd_rates(spark, ev_dir, wd)
    before = _rows(current_rates(spark, wd))

    state_dir = f"{wd}/aimd_state"
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    b1 = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > n // 2)
        .drop("rn")
    )
    prev = spark.read.parquet(state_dir).filter(F.col("batch_id") == 0)
    tail = prev.groupBy("host").agg(
        F.max(
            F.struct("batch_id", "last_ts", "last_event_id", "closing_rate_micro")
        ).alias("m")
    ).select("host", F.col("m.closing_rate_micro").alias("carry"))
    delta = _batch_delta(b1, tail).withColumn("batch_id", F.lit(1).cast("long"))
    (
        delta.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )
    assert _rows(current_rates(spark, wd)) == before
    assert _state_tail(spark, state_dir).count() > 0


def test_carried_halving_crosses_batch_boundary(spark, tmp_path):
    """host 3: an error closes batch 0 at init/2; batch 1's two successes
    must fold FROM that carried rate, not from init."""
    from webscraping_video_pipeline_spark.streaming.aimd import (
        AIMD_INIT,
        AIMD_STEP,
        current_rates,
        stream_aimd_rates,
    )
    from webscraping_video_pipeline_spark.streaming.revisit import EVENTS

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    os.makedirs(ev_dir, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1)

    def land(rows, name):
        df = spark.createDataFrame(rows, schema=EVENTS).coalesce(1)
        tmp = f"{ev_dir}_tmp_{name}"
        df.write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(f"{tmp}/{part}", f"{ev_dir}/{name}.parquet")
        shutil.rmtree(tmp)

    land([(0, t0, 3, "error", 1.0, None)], "b0")
    stream_aimd_rates(spark, ev_dir, wd)
    land(
        [
            (1, t0 + dt.timedelta(minutes=1), 3, "fetch", 1.0, None),
            (2, t0 + dt.timedelta(minutes=2), 3, "fetch", 1.0, None),
        ],
        "b1",
    )
    stream_aimd_rates(spark, ev_dir, wd)
    r = {x.host: x for x in current_rates(spark, wd).collect()}[3]
    assert r.n_events == 3 and r.n_errors == 1
    assert r.rate_micro == AIMD_INIT // 2 + 2 * AIMD_STEP
