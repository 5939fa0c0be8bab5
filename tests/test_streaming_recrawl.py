"""Streaming recrawl-scheduler state ≡ batch q182 when fetch-observation
files land in (ts, event_id)-rank order, plus replay idempotence of the
batch_id-partitioned delta state."""

from __future__ import annotations

import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from tests.test_streaming_revisit import _land_ts_slice  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_recrawl_schedule_matches_batch_q182(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.graph import (
        q182_recrawl_priority,
    )
    from webscraping_video_pipeline_spark.streaming.recrawl import (
        recrawl_schedule,
        stream_recrawl_state,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        _land_ts_slice(ev_dir, spark, cuts[i], cuts[i + 1], f"b{i}")
        stream_recrawl_state(spark, ev_dir, wd)

    got = _rows(recrawl_schedule(spark, wd, SF))
    want = _rows(q182_recrawl_priority(spark, SF))
    assert got == want
    # the state really is incremental: three delta partitions, and the
    # cross-batch boundary contributed sketch transitions (a URL's
    # content stream does not reset at a file boundary)
    state = spark.read.parquet(f"{wd}/recrawl_state")
    assert state.select("batch_id").distinct().count() == 3
    later = (
        state.filter(F.col("batch_id") > 0)
        .agg(F.sum("d_changes").alias("c"))
        .collect()[0]["c"]
    )
    assert later > 0


def test_stream_recrawl_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.recrawl import (
        recrawl_schedule,
        stream_recrawl_state,
    )

    ev_dir, wd = str(tmp_path / "events"), str(tmp_path / "wd")
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    _land_ts_slice(ev_dir, spark, 0, n // 2, "b0")
    stream_recrawl_state(spark, ev_dir, wd)
    before = _rows(recrawl_schedule(spark, wd, SF))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed state partition
    shutil.rmtree(f"{wd}/ckpt")
    stream_recrawl_state(spark, ev_dir, wd)
    after = _rows(recrawl_schedule(spark, wd, SF))
    assert after == before, "replayed batch double-applied its counters"
