"""Round-3 corpus ops: sequence packing (distributed prefix sum),
deterministic stratified split, and intra-document chunk dedup.

Each query's value correctness vs DuckDB is covered by the driver /
tools/compare_oracle.py; these tests pin the properties the oracle hash
cannot express: conservation invariants, pure-Python adversarial
oracles, partition-count independence of the prefix sum, and the
zero-shuffle claim of q70's executed plan.
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    _PACK_BUDGET,
    q68_sequence_packing,
    q69_stratified_split,
    q70_intradoc_chunk_dedup,
)

SF = "/root/testdata/sf0.001"


def _docs_total_tokens(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.sum(F.size(F.split("text", " "))).cast("long").alias("t"),
                F.count(F.lit(1)).alias("n"))
        .first()
    )


def test_q68_conserves_docs_and_tokens(spark):
    tot = _docs_total_tokens(spark)
    agg = q68_sequence_packing(spark, SF).agg(
        F.sum("n_docs").cast("long").alias("d"),
        F.sum("n_tokens").cast("long").alias("t"),
    ).first()
    assert agg["d"] == tot["n"]
    assert agg["t"] == tot["t"]


def test_q68_matches_single_pass_python_cumsum(spark):
    # the two-level distributed prefix sum must equal the sequential scan
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n"))
        .collect()
    )
    cum = 0
    expect = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        seq = cum // _PACK_BUDGET
        cum += r["n"]
        e = expect.setdefault(seq, [0, 0, r["doc_id"], r["doc_id"]])
        e[0] += 1
        e[1] += r["n"]
        e[3] = r["doc_id"]
    got = {
        r["seq_id"]: [r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"]]
        for r in q68_sequence_packing(spark, SF).collect()
    }
    assert got == expect


def test_q68_partition_count_independent(spark):
    # same answer whether the scan lands in 1 task or 16 — the prefix
    # sum must not depend on physical partitioning
    a = sorted(map(tuple, q68_sequence_packing(spark, SF).collect()))
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        b = sorted(map(tuple, q68_sequence_packing(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert a == b


def test_q69_assignment_is_pure_function_of_keys(spark):
    # recompute the split driver-side from md5 and compare the rollup
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "lang", F.size(F.split("text", " ")).cast("long").alias("n")
    ).collect()
    expect = {}
    for r in docs:
        sk = hashlib.md5(f"{r['doc_id']}|{r['source']}".encode()).hexdigest()[:8]
        split = "train" if sk < "cccccccc" else ("valid" if sk < "e6666666" else "test")
        e = expect.setdefault((r["source"], r["lang"], split), [0, 0])
        e[0] += 1
        e[1] += r["n"]
    got = {
        (r["source"], r["lang"], r["split"]): [r["n_docs"], r["n_tokens"]]
        for r in q69_stratified_split(spark, SF).collect()
    }
    assert got == expect


def test_q69_split_rates_near_nominal(spark):
    rows = q69_stratified_split(spark, SF).collect()
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    n = sum(by_split.values())
    assert 0.7 < by_split["train"] / n < 0.9
    assert by_split.get("valid", 0) / n < 0.2
    assert by_split.get("test", 0) / n < 0.2


def test_q70_adversarial_repetition(spark, tmp_path):
    # doc 0: 'a b c' repeated 4x -> 4 chunks, 3 dropped;
    # doc 1: no repeats; doc 2: 7 words -> last chunk is 1 word
    data = [
        (0, "a b c a b c a b c a b c"),
        (1, "one two three four five six"),
        (2, "p q r p q r p"),
    ]
    sf_dir = str(tmp_path / "adv")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in q70_intradoc_chunk_dedup(spark, sf_dir).collect()}
    assert got[0]["n_chunks"] == 4 and got[0]["n_dropped"] == 3
    assert got[0]["cleaned_text"] == "a b c"
    assert got[1]["n_dropped"] == 0
    assert got[1]["cleaned_text"] == "one two three four five six"
    # doc 2: chunks 'p q r', 'p q r', 'p' -> second dropped, trailing kept
    assert got[2]["n_chunks"] == 3 and got[2]["n_dropped"] == 1
    assert got[2]["cleaned_text"] == "p q r p"


def test_q70_plan_has_zero_shuffles(spark):
    plan = (
        q70_intradoc_chunk_dedup(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_q71_weights_normalize_and_flatten(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q71_temperature_mix_weights,
    )

    rows = q71_temperature_mix_weights(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-9
    # temperature alpha=0.5 flattens: the largest source's weight drops
    # below its raw share, the smallest source's weight rises above it
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["weight"] < big["raw_share"]
    assert small["weight"] > small["raw_share"]
    for r in rows:
        assert abs(r["epochs"] * r["n_tokens"] - r["expected_tokens"]) < 1e-6


def test_wav_codec_roundtrip_and_validation():
    from webscraping_video_pipeline_spark.contract.similarity import (
        _decode_wav,
        _synth_wav,
    )

    for doc_id in (0, 1, 32, 999):
        rate, samples = _decode_wav(_synth_wav(doc_id))
        assert rate == 8000
        n = 32 + doc_id % 33
        assert len(samples) == n
        assert samples == [((doc_id * 31 + i * 17) % 4096) - 2048 for i in range(n)]
    import pytest

    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxJUNK" + b"\x00" * 32)
    with pytest.raises(ValueError):
        _decode_wav(b"not audio at all")


def test_q70_differential_vs_python_oracle_random_docs(spark, tmp_path):
    """Seeded randomized differential test: 300 collision-heavy docs
    (tiny vocabulary forces repeated chunks at every position) must match
    a pure-Python first-occurrence reimplementation exactly."""
    import random

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    data = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(300)
    ]
    sf_dir = str(tmp_path / "rand")
    spark.createDataFrame(data, "doc_id long, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )

    def py_q70(text):
        ws = text.split(" ")
        chunks = [
            " ".join(ws[j * 3 : j * 3 + 3]) for j in range((len(ws) + 2) // 3)
        ]
        seen, kept = set(), []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        return len(chunks), len(chunks) - len(kept), " ".join(kept)

    got = {r["doc_id"]: (r["n_chunks"], r["n_dropped"], r["cleaned_text"])
           for r in q70_intradoc_chunk_dedup(spark, sf_dir).collect()}
    want = {i: py_q70(t) for i, t in data}
    assert got == want
