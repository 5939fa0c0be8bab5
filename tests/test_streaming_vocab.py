"""Streaming vocabulary-growth ledger ≡ batch recount: in-order landings
reproduce the exact per-batch growth curve; ANY landing order reproduces
the order-invariant cumulative vocabulary; replays are idempotent and
partial commits are scrubbed (the commit.py ledger discipline)."""

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


def _py_words(docs):
    return [
        (d, [w for w in t.lower().split(" ") if w]) for d, t in sorted(docs)
    ]


def _py_curve(batches):
    """batches: list of lists of (doc_id, text) — expected growth rows."""
    seen: set = set()
    out = []
    dc = tc = 0
    for bid, docs in enumerate(batches):
        nd = len(docs)
        words = [w for _, ws in _py_words(docs) for w in ws]
        bw = set(words)
        new = bw - seen
        seen |= bw
        dc += nd
        tc += len(words)
        out.append((bid, nd, len(words), len(new), dc, tc, len(seen)))
    return sorted(out)


def _docs(spark, pred):
    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(pred)
        .select("doc_id", "text")
        .collect()
    ]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_vocab_matches_python_curve_in_order(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.vocab import (
        stream_vocab_state,
        vocab_growth,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    preds = [
        F.col("doc_id") < 20,
        (F.col("doc_id") >= 20) & (F.col("doc_id") < 35),
        F.col("doc_id") >= 35,
    ]
    for i, pred in enumerate(preds):
        _land_slice(docs_dir, spark, pred, f"b{i}")
        stream_vocab_state(spark, docs_dir, wd)

    want = _py_curve([_docs(spark, p) for p in preds])
    assert _rows(vocab_growth(spark, wd)) == want
    # the per-batch new-word partitions exactly partition the vocabulary
    state = spark.read.parquet(f"{wd}/vocab_state")
    assert state.count() == state.select("word").distinct().count()


def test_stream_vocab_cumulative_is_order_invariant(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.vocab import (
        stream_vocab_state,
        vocab_growth,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    # overlap-free slices landing out of doc order: 2, 0, 1
    for i, res in enumerate((2, 0, 1)):
        _land_slice(docs_dir, spark, F.col("doc_id") % 3 == res, f"b{i}")
        stream_vocab_state(spark, docs_dir, wd)

    rows = sorted(vocab_growth(spark, wd).collect(), key=lambda r: r.batch_id)
    docs = _docs(spark, F.lit(True))
    all_words = {w for _, ws in _py_words(docs) for w in ws}
    n_tokens = sum(len(ws) for _, ws in _py_words(docs))
    assert rows[-1].vocab_cum == len(all_words)
    assert rows[-1].tokens_cum == n_tokens
    assert rows[-1].docs_cum == len(docs)
    assert sum(r.new_words for r in rows) == len(all_words)


def test_stream_vocab_replay_is_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.vocab import (
        stream_vocab_state,
        vocab_growth,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") < 30, "b0")
    stream_vocab_state(spark, docs_dir, wd)
    _land_slice(docs_dir, spark, F.col("doc_id") >= 30, "b1")
    stream_vocab_state(spark, docs_dir, wd)
    before = _rows(vocab_growth(spark, wd))
    # at-least-once replay: wipe only the stream checkpoint so both
    # batches fire again against the already-committed ledgers
    shutil.rmtree(f"{wd}/ckpt")
    stream_vocab_state(spark, docs_dir, wd)
    assert _rows(vocab_growth(spark, wd)) == before
    # the counts ledger has exactly one row per batch (a batch whose
    # words were all already seen writes no vocab_state partition)
    counts = spark.read.parquet(f"{wd}/vocab_counts")
    assert sorted(
        r.batch_id for r in counts.select("batch_id").distinct().collect()
    ) == [0, 1]
    assert counts.count() == 2


def test_stream_vocab_partial_commit_is_scrubbed(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.commit import batch_committed
    from webscraping_video_pipeline_spark.streaming.vocab import (
        stream_vocab_state,
        vocab_growth,
    )

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land_slice(docs_dir, spark, F.col("doc_id") < 30, "b0")
    stream_vocab_state(spark, docs_dir, wd)
    want = _rows(vocab_growth(spark, wd))
    # crash between the state write and the marker: marker gone, both
    # partitions corrupted — replay must scrub and rewrite, not skip and
    # not double-count the corrupt state rows in the anti-join
    cpart = f"{wd}/vocab_counts/batch_id=0"
    assert batch_committed(cpart)
    os.remove(f"{cpart}/_COMMITTED")
    with open(f"{wd}/vocab_state/batch_id=0/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    shutil.rmtree(f"{wd}/ckpt")
    stream_vocab_state(spark, docs_dir, wd)
    assert _rows(vocab_growth(spark, wd)) == want
