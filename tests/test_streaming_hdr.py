"""Streaming HDR bucket state ≡ batch q177 for ANY event file landing
order (bucket counts are pure sums — no boundary carry), plus replay
idempotence and partial-commit scrubbing of the batch_id ledger. Counts
are additive, NOT idempotent, so these tests are what prove the commit-
marker discipline prevents double-adds."""

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


def test_stream_hdr_matches_batch_q177_any_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q177_hdr_latency_sketch,
    )
    from webscraping_video_pipeline_spark.streaming.hdr import (
        latency_quantiles,
        stream_hdr_buckets,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    # deliberately NON-contiguous, non-ordered slices: mod-3 residues
    # landing 2, 0, 1 — additive state must not care
    for i, res in enumerate((2, 0, 1)):
        _land_slice(events_dir, spark, F.col("event_id") % 3 == res, f"b{i}")
        stream_hdr_buckets(spark, events_dir, wd)

    got = _rows(latency_quantiles(spark, wd))
    want = _rows(q177_hdr_latency_sketch(spark, SF))
    assert got == want
    state = spark.read.parquet(f"{wd}/hdr_state")
    assert state.select("batch_id").distinct().count() == 3


def test_stream_hdr_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.hdr import (
        latency_quantiles,
        stream_hdr_buckets,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    _land_slice(events_dir, spark, F.col("event_id") % 2 == 0, "b0")
    stream_hdr_buckets(spark, events_dir, wd)
    before = _rows(latency_quantiles(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed state partition — a
    # double-add would inflate n and shift every quantile
    shutil.rmtree(f"{wd}/ckpt")
    stream_hdr_buckets(spark, events_dir, wd)
    after = _rows(latency_quantiles(spark, wd))
    assert after == before, "replayed batch double-added its bucket counts"
    state = spark.read.parquet(f"{wd}/hdr_state")
    assert state.select("batch_id").distinct().count() == 1


def test_stream_hdr_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import batch_committed
    from webscraping_video_pipeline_spark.streaming.hdr import (
        latency_quantiles,
        stream_hdr_buckets,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    _land_slice(events_dir, spark, F.col("event_id") % 2 == 0, "b0")
    stream_hdr_buckets(spark, events_dir, wd)
    want = _rows(latency_quantiles(spark, wd))
    # simulate a crash between data write and marker: drop the marker and
    # corrupt the partition — replay must scrub and rewrite, not skip
    part = f"{wd}/hdr_state/batch_id=0"
    assert batch_committed(part)
    os.remove(f"{part}/_COMMITTED")
    with open(f"{part}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_hdr_buckets(spark, events_dir, wd)
    assert _rows(latency_quantiles(spark, wd)) == want
