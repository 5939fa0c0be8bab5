"""Streaming skew monitor ≡ batch q193 for ANY fetch-record landing
order (pure additive counters), plus replay idempotence and
partial-commit scrubbing of the batch_id-partitioned counter state."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land_slice(events_dir: str, spark, pred, name: str) -> None:
    df = spark.read.parquet(f"{SF}/events.parquet").filter(pred).coalesce(1)
    tmp = f"{events_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(events_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{events_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_skew_matches_batch_q193_any_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q193_partition_skew_audit,
    )
    from webscraping_video_pipeline_spark.streaming.skew import (
        skew_audit,
        stream_skew,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    # non-contiguous, non-ordered slices: mod-3 residues landing 2, 0, 1
    # — counters are additive, order must not matter
    for i, res in enumerate((2, 0, 1)):
        _land_slice(events_dir, spark, F.col("event_id") % 3 == res, f"b{i}")
        stream_skew(spark, events_dir, wd)

    got = _rows(skew_audit(spark, wd))
    want = _rows(q193_partition_skew_audit(spark, SF))
    assert got == want
    state = spark.read.parquet(f"{wd}/skew_state")
    assert state.select("batch_id").distinct().count() == 3
    # the state is counters, not the corpus: <= 3 strategies x 32 parts
    # rows per batch
    assert state.count() <= 3 * 32 * 3


def test_stream_skew_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.skew import (
        skew_audit,
        stream_skew,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    _land_slice(events_dir, spark, F.col("event_id") % 2 == 0, "b0")
    stream_skew(spark, events_dir, wd)
    before = _rows(skew_audit(spark, wd))
    shutil.rmtree(f"{wd}/ckpt")
    stream_skew(spark, events_dir, wd)
    after = _rows(skew_audit(spark, wd))
    assert after == before, "replayed batch double-applied its counters"


def test_stream_skew_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import batch_committed
    from webscraping_video_pipeline_spark.streaming.skew import (
        skew_audit,
        stream_skew,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    _land_slice(events_dir, spark, F.col("event_id") % 2 == 0, "b0")
    stream_skew(spark, events_dir, wd)
    want = _rows(skew_audit(spark, wd))
    part = f"{wd}/skew_state/batch_id=0"
    assert batch_committed(part)
    os.remove(f"{part}/_COMMITTED")
    with open(f"{part}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_skew(spark, events_dir, wd)
    assert _rows(skew_audit(spark, wd)) == want
