"""Streaming chunk dedup ≡ batch q64 when document files land in doc_id
order, plus crash-replay idempotence of the batch_id-partitioned sinks."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land(docs_dir: str, spark, lo: int, hi: int, name: str) -> None:
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .coalesce(1)
    )
    tmp = f"{docs_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(docs_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{docs_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def test_stream_chunk_dedup_matches_batch_q64(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.quality import (
        q64_first_occurrence_chunk_dedup,
    )
    from webscraping_video_pipeline_spark.streaming.corpus import stream_chunk_dedup

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    # three files landing in doc_id order -> three micro-batches
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        _land(docs_dir, spark, lo, hi, f"b{i}")
        stream_chunk_dedup(spark, docs_dir, wd)

    got = {
        (r.doc_id, r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in spark.read.parquet(f"{wd}/cleaned_docs").collect()
    }
    want = {
        (r.doc_id, r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in q64_first_occurrence_chunk_dedup(spark, SF).collect()
    }
    assert got == want
    # cross-batch state really deduped: later batches dropped chunks first
    # seen in batch 0
    per_batch = (
        spark.read.parquet(f"{wd}/cleaned_docs")
        .groupBy("batch_id")
        .agg(F.sum("n_dropped").alias("nd"))
        .collect()
    )
    assert len(per_batch) == 3
    assert all(r.nd > 0 for r in per_batch)


def test_stream_chunk_dedup_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.corpus import stream_chunk_dedup

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land(docs_dir, spark, 0, 200, "b0")
    stream_chunk_dedup(spark, docs_dir, wd)
    before = sorted(
        (r.doc_id, r.n_dropped)
        for r in spark.read.parquet(f"{wd}/cleaned_docs").collect()
    )
    # simulate an at-least-once replay of a half-committed batch: wipe the
    # commit marker (chunk_seen) but keep the cleaned output, re-drain with
    # a fresh stream checkpoint so batch 0 fires again
    shutil.rmtree(f"{wd}/chunk_seen")
    shutil.rmtree(f"{wd}/ckpt")
    stream_chunk_dedup(spark, docs_dir, wd)
    after = sorted(
        (r.doc_id, r.n_dropped)
        for r in spark.read.parquet(f"{wd}/cleaned_docs").collect()
    )
    assert after == before  # partition overwrite, no duplicated rows


def test_stream_intradoc_dedup_matches_batch_q70(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.quality import (
        q70_intradoc_chunk_dedup,
    )
    from webscraping_video_pipeline_spark.streaming.corpus import (
        stream_intradoc_dedup,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    for i, (lo, hi) in enumerate([(0, 250), (250, 10**9)]):
        _land(docs_dir, spark, lo, hi, f"b{i}")
        stream_intradoc_dedup(spark, docs_dir, wd)

    got = {
        (r.doc_id, r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in spark.read.parquet(f"{wd}/intradoc_cleaned").collect()
    }
    want = {
        (r.doc_id, r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in q70_intradoc_chunk_dedup(spark, SF).collect()
    }
    # stateless operator: stream == batch regardless of file batching
    assert got == want
