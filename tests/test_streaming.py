"""Structured Streaming: windowed aggs driven to completion on bounded
input match their batch twins; stateful token bucket admits per capacity.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.streaming.windows import (
    run_to_memory,
    session_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_and_batch(spark):
    """events as (streaming DF, batch DF); parquet normalized into a dir."""
    d = tempfile.mkdtemp(prefix="evt_stream_")
    src = f"{SF}/events.parquet"
    if os.path.isdir(src):
        shutil.copytree(src, f"{d}/data")
    else:
        os.makedirs(f"{d}/data")
        shutil.copy(src, f"{d}/data/part-0.parquet")
    batch = spark.read.parquet(f"{d}/data")
    stream = spark.readStream.schema(batch.schema).parquet(f"{d}/data")
    yield stream, batch
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, stream_and_batch):
    stream, batch = stream_and_batch
    run_to_memory(tumbling_counts(stream), "tumb_out", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM tumb_out").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in tumbling_counts(batch).collect()
    }
    assert got == want and len(want) > 0


def test_session_stream_matches_batch(spark, stream_and_batch):
    stream, batch = stream_and_batch
    run_to_memory(session_counts(stream), "sess_out", output_mode="complete")
    got = sorted(
        (r.session_start, r.user_id, r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    want = sorted(
        (r.session_start, r.user_id, r.n_events) for r in session_counts(batch).collect()
    )
    assert got == want and len(want) > 0


def test_stateful_token_bucket(spark, stream_and_batch):
    from webscraping_video_pipeline_spark.streaming.stateful import politeness_stream

    stream, _ = stream_and_batch
    cands = stream.select(
        F.concat(F.lit("h"), (F.col("user_id") % 3).cast("string")).alias("host"),
        F.concat(F.lit("https://x/"), F.col("event_id")).alias("canon_url"),
        F.col("value").alias("priority"),
    )
    run_to_memory(politeness_stream(cands, capacity=5), "bucket_out")
    out = spark.sql("SELECT host, count(*) AS n FROM bucket_out WHERE admitted GROUP BY host")
    rows = out.collect()
    assert rows, "no admitted rows"
    for r in rows:
        assert r.n <= 5, f"host {r.host} admitted {r.n} > capacity"
