"""Streaming near-dup dedup: greedy-oracle equivalence, batch-split
invariance, first-wins (not connected-components) semantics, and
at-least-once replay idempotence."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")


def _corpus() -> list[tuple[int, str]]:
    """18 docs in three DISJOINT word universes (cross-family Jaccard = 0,
    so the planted relations are exact): family A = chain 0~1~2 (0~1 and
    1~2 near-dup, 0~2 NOT), family B = exact dup pair (5, 12) crossing a
    batch boundary, family C = near-dup pair (6, 15) crossing a batch
    boundary, rest pairwise-disjoint fillers."""
    base = [f"a{i:02d}" for i in range(30)]
    doc0 = " ".join(base)
    # doc1: replace 4 words in the middle -> |∩|=26, |∪|=34, J=0.76
    mid = list(base)
    for j, r in zip((10, 12, 14, 16), ("x1", "x2", "x3", "x4")):
        mid[j] = r
    doc1 = " ".join(mid)
    # doc2: keep doc1's replacements, swap 4 OTHER originals ->
    # J(1,2)=26/34=0.76 ; J(0,2)=22/38=0.58 < 0.7
    far = list(mid)
    for j, r in zip((20, 22, 24, 26), ("y1", "y2", "y3", "y4")):
        far[j] = r
    doc2 = " ".join(far)
    dupb = " ".join(f"b{i:02d}" for i in range(30))
    cw = [f"c{i:02d}" for i in range(30)]
    nearc = " ".join(cw)
    nearc2 = " ".join(cw[:28] + ["z1", "z2"])  # 28/32 = 0.875
    docs: dict[int, str] = {0: doc0, 1: doc1, 2: doc2, 5: dupb, 12: dupb, 6: nearc, 15: nearc2}
    for i in range(18):
        if i not in docs:
            # pairwise-disjoint fillers (distinct word universes)
            docs[i] = " ".join(f"f{i}_{j}" for j in range(12))
    return sorted(docs.items())


def _land(spark, docs_dir: str, rows: list[tuple[int, str]], name: str) -> None:
    df = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1)
    tmp = f"{docs_dir}_tmp_{name}"
    df.write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.makedirs(docs_dir, exist_ok=True)
    shutil.move(f"{tmp}/{part}", f"{docs_dir}/{name}.parquet")
    shutil.rmtree(tmp)


def _greedy_oracle(spark, rows: list[tuple[int, str]]) -> set[int]:
    """Sequential first-wins with the SAME primitives (bands + hashed-word
    Jaccard) collected once via Spark, resolved in pure Python."""
    from webscraping_video_pipeline_spark.streaming.neardup import (
        JACCARD_THRESHOLD,
        minhash_bands,
        word_hashes,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    bands: dict[int, set] = {}
    for r in minhash_bands(df).collect():
        bands.setdefault(r.doc_id, set()).add((r.band, r.sig))
    wh = {r.doc_id: set(r.wh) for r in word_hashes(df).collect()}
    kept: list[int] = []
    for i, _ in rows:
        dup = any(
            bands[k] & bands[i]
            and len(wh[k] & wh[i]) / len(wh[k] | wh[i]) >= JACCARD_THRESHOLD
            for k in kept
        )
        if not dup:
            kept.append(i)
    return set(kept)


def _run(spark, tmp_path, splits: list[list[tuple[int, str]]]) -> set[int]:
    from webscraping_video_pipeline_spark.streaming.neardup import stream_neardup_dedup

    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    for i, rows in enumerate(splits):
        _land(spark, docs_dir, rows, f"b{i}")
        stream_neardup_dedup(spark, docs_dir, wd)
    return {r.doc_id for r in spark.read.parquet(f"{wd}/kept_docs").collect()}


def test_stream_neardup_matches_greedy_oracle_and_first_wins(spark, tmp_path):
    rows = _corpus()
    want = _greedy_oracle(spark, rows)
    # fixture sanity: the planted relations actually hold
    assert 1 not in want and 12 not in want and 15 not in want, want
    assert 0 in want and 2 in want, want  # first-wins keeps chain ends
    got = _run(spark, tmp_path, [rows[:6], rows[6:12], rows[12:]])
    assert got == want


def test_stream_neardup_split_invariant(spark, tmp_path):
    rows = _corpus()
    one = _run(spark, tmp_path / "one", [rows])
    three = _run(spark, tmp_path / "three", [rows[:6], rows[6:12], rows[12:]])
    assert one == three


def test_stream_neardup_replay_idempotent(spark, tmp_path):
    from webscraping_video_pipeline_spark.streaming.neardup import stream_neardup_dedup

    rows = _corpus()
    docs_dir, wd = str(tmp_path / "docs"), str(tmp_path / "wd")
    _land(spark, docs_dir, rows, "b0")
    stream_neardup_dedup(spark, docs_dir, wd)
    before = sorted(r.doc_id for r in spark.read.parquet(f"{wd}/kept_docs").collect())
    n_state = spark.read.parquet(f"{wd}/state_wordhashes").count()
    # replay of a half-committed batch: commit marker gone, output present
    shutil.rmtree(f"{wd}/state_wordhashes")
    shutil.rmtree(f"{wd}/ckpt_neardup")
    stream_neardup_dedup(spark, docs_dir, wd)
    after = sorted(r.doc_id for r in spark.read.parquet(f"{wd}/kept_docs").collect())
    assert after == before
    assert spark.read.parquet(f"{wd}/state_wordhashes").count() == n_state
