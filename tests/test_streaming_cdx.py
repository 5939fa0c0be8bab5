"""Streaming CDX index ≡ batch q91 when document files land in doc_id
order, plus replay idempotence of the batch_id-partitioned index and
offset continuity across batches."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land_doc_slice(docs_dir: str, spark, lo: int, hi: int, name: str) -> None:
    """Write the doc_id slice [lo, hi) as one file — batches in doc_id
    order, the layout under which stream ≡ batch holds exactly."""
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_cdx_matches_batch_q91(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.ingest import q91_cdx_offset_index
    from webscraping_video_pipeline_spark.streaming.cdx import (
        cdx_index,
        stream_cdx_index,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    ids = [
        r["m"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .agg(F.max("doc_id").alias("m"))
        .collect()
    ]
    hi = ids[0] + 1
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    for i in range(3):
        _land_doc_slice(docs_dir, spark, cuts[i], cuts[i + 1], f"b{i}")
        stream_cdx_index(spark, docs_dir, wd)

    got = _rows(cdx_index(spark, wd))
    want = _rows(q91_cdx_offset_index(spark, SF))
    assert got == want
    # genuinely incremental: three committed partitions, and later batches
    # continue earlier offsets (some batch->batch base is nonzero)
    state = spark.read.parquet(f"{wd}/cdx_index")
    assert state.select("batch_id").distinct().count() == 3
    carried = (
        state.filter((F.col("batch_id") > 0) & (F.col("rec_offset") > 0)).count()
    )
    assert carried > 0


def test_stream_cdx_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.cdx import (
        cdx_index,
        stream_cdx_index,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_doc_slice(docs_dir, spark, 0, 250, "b0")
    stream_cdx_index(spark, docs_dir, wd)
    before = _rows(cdx_index(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed index partition
    shutil.rmtree(f"{wd}/ckpt")
    stream_cdx_index(spark, docs_dir, wd)
    after = _rows(cdx_index(spark, wd))
    assert after == before, "replayed batch double-shifted offsets"
