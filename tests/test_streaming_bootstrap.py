"""Streaming bootstrap CIs ≡ batch q197 for ANY document landing order
(weights depend only on (replicate, doc_id) — per-replicate sums are
additive), plus replay idempotence and partial-commit scrubbing of the
batch_id-partitioned replicate accumulators."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _land_slice(docs_dir: str, spark, pred, name: str) -> None:
    df = spark.read.parquet(f"{SF}/documents.parquet").filter(pred).coalesce(1)
    tmp = f"{docs_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(docs_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{docs_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_bootstrap_matches_batch_q197_any_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.quality import (
        q197_poisson_bootstrap_ci,
    )
    from webscraping_video_pipeline_spark.streaming.bootstrap import (
        bootstrap_ci,
        stream_bootstrap,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    # non-contiguous, non-ordered slices: mod-3 residues landing 2, 0, 1
    # — every replicate's weights split across batches, sums must not care
    for i, res in enumerate((2, 0, 1)):
        _land_slice(docs_dir, spark, F.col("doc_id") % 3 == res, f"b{i}")
        stream_bootstrap(spark, docs_dir, wd)

    got = _rows(bootstrap_ci(spark, wd))
    want = _rows(q197_poisson_bootstrap_ci(spark, SF))
    assert got == want
    state = spark.read.parquet(f"{wd}/bootstrap_state")
    assert state.select("batch_id").distinct().count() == 3
    # the state is 40 accumulator rows per batch, never the corpus
    assert state.count() == 3 * 40


def test_stream_bootstrap_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.bootstrap import (
        bootstrap_ci,
        stream_bootstrap,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_bootstrap(spark, docs_dir, wd)
    before = _rows(bootstrap_ci(spark, wd))
    shutil.rmtree(f"{wd}/ckpt")
    stream_bootstrap(spark, docs_dir, wd)
    after = _rows(bootstrap_ci(spark, wd))
    assert after == before, "replayed batch double-applied its accumulators"


def test_stream_bootstrap_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import batch_committed
    from webscraping_video_pipeline_spark.streaming.bootstrap import (
        bootstrap_ci,
        stream_bootstrap,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_bootstrap(spark, docs_dir, wd)
    want = _rows(bootstrap_ci(spark, wd))
    part = f"{wd}/bootstrap_state/batch_id=0"
    assert batch_committed(part)
    os.remove(f"{part}/_COMMITTED")
    with open(f"{part}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_bootstrap(spark, docs_dir, wd)
    assert _rows(bootstrap_ci(spark, wd)) == want
