"""Streaming takedown ledger ≡ batch q190 for ANY fetch-record landing
order (sums + distinct-over-union are order-independent), plus replay
idempotence and partial-commit scrubbing of the batch_id-partitioned
matched-slice state."""

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


def test_stream_takedown_matches_batch_q190_any_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q190_takedown_compliance,
    )
    from webscraping_video_pipeline_spark.streaming.takedown import (
        stream_takedown,
        takedown_ledger,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    # non-contiguous, non-ordered slices: mod-3 residues landing 2, 0, 1
    # — the ledger is additive/distinct-over-union, order must not matter.
    # Residue slices SPLIT urls across batches (url = f(event_id)), so the
    # distinct-url census genuinely exercises cross-batch dedup.
    for i, res in enumerate((2, 0, 1)):
        _land_slice(events_dir, spark, F.col("event_id") % 3 == res, f"b{i}")
        stream_takedown(spark, events_dir, wd)

    got = _rows(takedown_ledger(spark, wd))
    want = _rows(q190_takedown_compliance(spark, SF))
    assert got == want
    state = spark.read.parquet(f"{wd}/takedown_state")
    assert state.select("batch_id").distinct().count() == 3
    # the state really is the purged slice, not the corpus
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert state.count() < n_events


def test_stream_takedown_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.takedown import (
        stream_takedown,
        takedown_ledger,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    _land_slice(events_dir, spark, F.col("event_id") % 2 == 0, "b0")
    stream_takedown(spark, events_dir, wd)
    before = _rows(takedown_ledger(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed state partition
    shutil.rmtree(f"{wd}/ckpt")
    stream_takedown(spark, events_dir, wd)
    after = _rows(takedown_ledger(spark, wd))
    assert after == before, "replayed batch double-applied its tallies"


def test_stream_takedown_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import batch_committed
    from webscraping_video_pipeline_spark.streaming.takedown import (
        stream_takedown,
        takedown_ledger,
    )

    events_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    _land_slice(events_dir, spark, F.col("event_id") % 2 == 0, "b0")
    stream_takedown(spark, events_dir, wd)
    want = _rows(takedown_ledger(spark, wd))
    part = f"{wd}/takedown_state/batch_id=0"
    assert batch_committed(part)
    os.remove(f"{part}/_COMMITTED")
    with open(f"{part}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_takedown(spark, events_dir, wd)
    assert _rows(takedown_ledger(spark, wd)) == want
