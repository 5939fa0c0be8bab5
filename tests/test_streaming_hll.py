"""Streaming HLL register state ≡ batch q174 (registers-only columns)
for ANY document file landing order — register merge is elementwise MAX,
so the state is order-independent AND double-apply-proof — plus replay
idempotence and partial-commit scrubbing of the batch_id ledger."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

# q174 emits fixture-only exact-count audit columns the sketch state
# deliberately does not keep; the twin compares the registers-only slice.
SKETCH_COLS = ["lang", "n_zero_registers", "harmonic_sum", "raw_estimate", "estimate"]


def _land_slice(docs_dir: str, spark, pred, name: str) -> None:
    df = spark.read.parquet(f"{SF}/documents.parquet").filter(pred).coalesce(1)
    tmp = f"{docs_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(docs_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{docs_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _rows(df):
    return sorted(tuple(r) for r in df.select(*SKETCH_COLS).collect())


def test_stream_hll_matches_batch_q174_any_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q174_hll_url_cardinality,
    )
    from webscraping_video_pipeline_spark.streaming.hll import (
        stream_hll_registers,
        url_cardinality,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    # non-contiguous, non-ordered, OVERLAP-FREE slices landing 2, 0, 1;
    # MAX-merge must not care about order
    for i, res in enumerate((2, 0, 1)):
        _land_slice(docs_dir, spark, F.col("doc_id") % 3 == res, f"b{i}")
        stream_hll_registers(spark, docs_dir, wd)

    got = _rows(url_cardinality(spark, wd))
    want = _rows(q174_hll_url_cardinality(spark, SF))
    assert got == want
    state = spark.read.parquet(f"{wd}/hll_state")
    assert state.select("batch_id").distinct().count() == 3


def test_stream_hll_overlapping_batches_still_exact(spark, tmp_path):
    """HLL's idempotence is stronger than the additive twins': even
    batches that RE-DELIVER the same documents (overlapping slices, not
    just replays) leave the register MAX unchanged."""
    from webscraping_video_pipeline_spark.contract.monitor import (
        q174_hll_url_cardinality,
    )
    from webscraping_video_pipeline_spark.streaming.hll import (
        stream_hll_registers,
        url_cardinality,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    # b0 = evens, b1 = ALL docs (every even doc delivered twice)
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_hll_registers(spark, docs_dir, wd)
    _land_slice(docs_dir, spark, F.lit(True), "b1")
    stream_hll_registers(spark, docs_dir, wd)

    got = _rows(url_cardinality(spark, wd))
    want = _rows(q174_hll_url_cardinality(spark, SF))
    assert got == want, "duplicate deliveries corrupted the MAX registers"


def test_stream_hll_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.hll import (
        stream_hll_registers,
        url_cardinality,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_hll_registers(spark, docs_dir, wd)
    before = _rows(url_cardinality(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so batch 0
    # fires again against the already-committed state partition
    shutil.rmtree(f"{wd}/ckpt")
    stream_hll_registers(spark, docs_dir, wd)
    after = _rows(url_cardinality(spark, wd))
    assert after == before
    state = spark.read.parquet(f"{wd}/hll_state")
    assert state.select("batch_id").distinct().count() == 1


def test_stream_hll_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import batch_committed
    from webscraping_video_pipeline_spark.streaming.hll import (
        stream_hll_registers,
        url_cardinality,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") % 2 == 0, "b0")
    stream_hll_registers(spark, docs_dir, wd)
    want = _rows(url_cardinality(spark, wd))
    # simulate a crash between data write and marker: drop the marker and
    # corrupt the partition — replay must scrub and rewrite, not skip
    part = f"{wd}/hll_state/batch_id=0"
    assert batch_committed(part)
    os.remove(f"{part}/_COMMITTED")
    with open(f"{part}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_hll_registers(spark, docs_dir, wd)
    assert _rows(url_cardinality(spark, wd)) == want
