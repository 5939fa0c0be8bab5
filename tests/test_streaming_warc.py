"""Streaming WARC revisit-record dedup ≡ batch q125 when capture files
land in timestamp order, plus replay idempotence of the
batch_id-partitioned delta state and an explicit cross-boundary revisit
pin on a hand-built two-file fixture."""

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


def test_stream_warc_matches_batch_q125(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.ingest import (
        q125_warc_revisit_dedup,
    )
    from webscraping_video_pipeline_spark.streaming.warc import (
        stream_warc_revisit,
        warc_storage_report,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        _land_ts_slice(ev_dir, spark, cuts[i], cuts[i + 1], f"b{i}")
        stream_warc_revisit(spark, ev_dir, wd)

    got = _rows(warc_storage_report(spark, wd))
    want = _rows(q125_warc_revisit_dedup(spark, SF))
    assert got == want
    # three delta partitions landed
    parts = [p for p in os.listdir(f"{wd}/warc_state") if p.startswith("batch_id=")]
    assert len(parts) == 3


def test_stream_warc_replay_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.warc import (
        _batch_delta,
        _state_tail,
        stream_warc_revisit,
        warc_storage_report,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    _land_ts_slice(ev_dir, spark, 0, n // 2, "b0")
    stream_warc_revisit(spark, ev_dir, wd)
    _land_ts_slice(ev_dir, spark, n // 2, n, "b1")
    stream_warc_revisit(spark, ev_dir, wd)
    before = _rows(warc_storage_report(spark, wd))

    # at-least-once replay of the LAST batch: rewriting its own partition
    # (what a restarted writer would do) must not change the report
    state_dir = f"{wd}/warc_state"
    last = spark.read.parquet(f"{SF}/events.parquet")  # superset replay input
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    b1 = (
        last.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > n // 2)
        .drop("rn")
    )
    prev = spark.read.parquet(state_dir).filter(F.col("batch_id") == 0)
    tail = prev.groupBy("url_id").agg(
        F.max(F.struct("batch_id", "last_ts", "last_event_id", "last_digest")).alias("m")
    ).select("url_id", F.col("m.last_digest").alias("last_digest"))
    delta = _batch_delta(b1, tail).withColumn("batch_id", F.lit(1).cast("long"))
    (
        delta.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )
    after = _rows(warc_storage_report(spark, wd))
    assert after == before
    # _state_tail sees both partitions
    assert _state_tail(spark, state_dir).count() > 0


def test_cross_boundary_revisit_is_counted(spark, tmp_path):
    """Two captures of the same URL with the SAME payload split across
    two files: the second must be marked a revisit via the carried
    state digest (the boundary case in-batch lag cannot see)."""
    from webscraping_video_pipeline_spark.streaming.revisit import EVENTS
    from webscraping_video_pipeline_spark.streaming.warc import (
        REVISIT_REC_BYTES,
        stream_warc_revisit,
        warc_storage_report,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    os.makedirs(ev_dir, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def land(rows, name):
        df = spark.createDataFrame(rows, schema=EVENTS).coalesce(1)
        tmp = f"{ev_dir}_tmp_{name}"
        df.write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(f"{tmp}/{part}", f"{ev_dir}/{name}.parquet")
        shutil.rmtree(tmp)

    # url_id = user_id % 200 = 7; same value 3.50 twice, then a change
    land([(0, t0, 7, "fetch", 3.50, None)], "b0")
    stream_warc_revisit(spark, ev_dir, wd)
    land(
        [
            (1, t0 + dt.timedelta(hours=1), 7, "fetch", 3.50, None),
            (2, t0 + dt.timedelta(hours=2), 7, "fetch", 4.25, None),
        ],
        "b1",
    )
    stream_warc_revisit(spark, ev_dir, wd)

    r = {x.url_id: x for x in warc_storage_report(spark, wd).collect()}[7]
    cents0, cents1 = 350, 425
    p0, p1 = 200 + cents0 % 1400, 200 + cents1 % 1400
    assert r.n_fetches == 3
    assert r.n_revisits == 1  # the cross-file duplicate, nothing else
    assert r.raw_bytes == 2 * p0 + p1
    assert r.stored_bytes == p0 + REVISIT_REC_BYTES + p1
