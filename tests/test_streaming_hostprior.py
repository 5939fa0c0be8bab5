"""Streaming host-prior trust state ≡ batch q159 for ANY document file
landing order (the counters are pure sums — no boundary carry), plus
replay idempotence of the batch_id-partitioned delta state."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land_slice(docs_dir: str, spark, pred, name: str) -> None:
    df = (
        spark.read.parquet(f"{SF}/documents.parquet").filter(pred).coalesce(1)
    )
    tmp = f"{docs_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(docs_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{docs_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_host_prior_matches_batch_q159_any_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.quality import (
        q159_host_prior_quality_gate,
    )
    from webscraping_video_pipeline_spark.streaming.hostprior import (
        host_trust,
        stream_host_prior,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    # deliberately NON-contiguous, non-ordered slices: mod-3 residues
    # landing 2, 0, 1 — additive state must not care
    for i, res in enumerate((2, 0, 1)):
        _land_slice(docs_dir, spark, F.col("doc_id") % 3 == res, f"b{i}")
        stream_host_prior(spark, docs_dir, wd)

    got = _rows(host_trust(spark, wd))
    want = _rows(q159_host_prior_quality_gate(spark, SF))
    assert got == want
    state = spark.read.parquet(f"{wd}/hostprior_state")
    assert state.select("batch_id").distinct().count() == 3


def test_stream_host_prior_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.hostprior import (
        host_trust,
        stream_host_prior,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_host_prior(spark, docs_dir, wd)
    before = _rows(host_trust(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed state partition
    shutil.rmtree(f"{wd}/ckpt")
    stream_host_prior(spark, docs_dir, wd)
    after = _rows(host_trust(spark, wd))
    assert after == before, "replayed batch double-applied its counters"


def test_stream_host_prior_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import (
        batch_committed,
    )
    from webscraping_video_pipeline_spark.streaming.hostprior import (
        host_trust,
        stream_host_prior,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_host_prior(spark, docs_dir, wd)
    want = _rows(host_trust(spark, wd))
    # simulate a crash between data write and marker: drop the marker and
    # corrupt the partition — replay must scrub and rewrite, not skip
    part = f"{wd}/hostprior_state/batch_id=0"
    assert batch_committed(part)
    os.remove(f"{part}/_COMMITTED")
    with open(f"{part}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_host_prior(spark, docs_dir, wd)
    assert _rows(host_trust(spark, wd)) == want
