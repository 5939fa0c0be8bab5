"""Round-5 operator pins (q155-q157) against pure-Python recomputes:

- q155 audio fingerprint: the energy-contour hash is gain-invariant by
  construction (same seed at gains 1/2/3 -> same fingerprint), the WAV
  decode round-trips the closed-form samples, and the Spark cluster
  table equals a pure-Python recompute over every doc;
- q156 video near-dup: planted same-seed pairs match >= 4 of 6 aligned
  frame hashes, the perturbed frame really changes its aHash, and the
  Spark pair table equals a pure-Python recompute;
- q157 BPE training: the 3-merge table equals an independent pure-Python
  BPE trainer, and the symbol-string replace implements the true greedy
  non-overlapping pass ('aaa' -> ('aa', 'a')).
"""

from __future__ import annotations

import collections
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.lm import (  # noqa: E402
    _bpe_adjacent_pairs,
    _bpe_apply_merge,
    q157_bpe_merge_train,
)
from webscraping_video_pipeline_spark.contract.similarity import (  # noqa: E402
    _ahash_bmp,
    _audio_contour_fp,
    _decode_wav,
    _synth_video_frame_bmp,
    _synth_wav_variant,
    q155_audio_fingerprint_dedup,
    q156_video_framehash_neardup,
)

SF = "/root/testdata/sf0.001"
N_DOCS = 500  # docs in the sf0.001 fixture


def _audio_fp(doc_id: int):
    _rate, samples = _decode_wav(_synth_wav_variant(doc_id))
    return _audio_contour_fp(samples)


# ----------------------------------------------------------------- q155
def test_q155_gain_invariance():
    # same seed at every gain -> identical fingerprint; docs d, d+41*3k
    # share seed AND gain, d+41 shares seed at the NEXT gain (gcd(41,3)=1)
    for seed in range(41):
        fps = {_audio_fp(seed + 41 * k) for k in range(3)}  # gains cycle 1,2,3
        assert len(fps) == 1, f"seed {seed}: gain changed the fingerprint"


def test_q155_decode_roundtrip():
    for doc_id in (0, 7, 40, 123):
        seed, gain = doc_id % 41, 1 + doc_id % 3
        rate, samples = _decode_wav(_synth_wav_variant(doc_id))
        assert rate == 8000
        assert len(samples) == 32 + seed % 33
        for i, v in enumerate(samples):
            base = ((seed * 997 + i * i * (13 + seed % 17) + i * 29) % 4096) - 2048
            assert v == gain * base


def test_q155_spark_matches_python(spark):
    got = {
        (r.n_frames, r.fp): (r.dup_count, r.canonical_doc, r.n_gains)
        for r in q155_audio_fingerprint_dedup(spark, SF).collect()
    }
    clusters: dict = collections.defaultdict(list)
    for doc_id in range(N_DOCS):
        clusters[_audio_fp(doc_id)].append(doc_id)
    want = {
        key: (len(ds), min(ds), len({1 + d % 3 for d in ds}))
        for key, ds in clusters.items()
    }
    assert got == want
    # every big cluster mixes gains: the near-dup exact-PCM hashing misses
    assert all(v[2] == 3 for v in got.values() if v[0] >= 3)


# ----------------------------------------------------------------- q156
def _frame_hash(doc_id: int, fi: int):
    return _ahash_bmp(_synth_video_frame_bmp(doc_id, fi))


def test_q156_planted_pair_and_perturbation():
    # docs 1 and 98 share seed 1 but perturb different frames (p=1 vs p=2)
    matched = sum(_frame_hash(1, fi) == _frame_hash(98, fi) for fi in range(6))
    assert matched >= 4
    # the perturbed frame really changes the hash for this pair
    assert _frame_hash(1, 1) != _frame_hash(98, 1)
    assert _frame_hash(1, 2) != _frame_hash(98, 2)
    # docs 1 and 583 share seed AND p (583 = 1 + 97*6): all 6 frames match
    assert sum(_frame_hash(1, fi) == _frame_hash(583, fi) for fi in range(6)) == 6


def test_q156_spark_matches_python(spark):
    got = {
        (r.doc_a, r.doc_b): r.matched_frames
        for r in q156_video_framehash_neardup(spark, SF).collect()
    }
    hashes = {
        (d, fi): _frame_hash(d, fi) for d in range(N_DOCS) for fi in range(6)
    }
    want: dict = {}
    by_bucket: dict = collections.defaultdict(list)
    for (d, fi), (w, h, ah) in hashes.items():
        by_bucket[(fi, w, h, ah)].append(d)
    pair_counts: dict = collections.defaultdict(int)
    for docs in by_bucket.values():
        docs.sort()
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                pair_counts[(a, b)] += 1
    want = {p: c for p, c in pair_counts.items() if c >= 4}
    assert got == want
    assert got, "fixture should plant at least one near-dup pair"


# ----------------------------------------------------------------- q157
def _python_bpe_merges(texts, n_merges=3):
    words: collections.Counter = collections.Counter()
    for txt in texts:
        for w in txt.lower().split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pc: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        (s1, s2), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, s1, s2, cnt))
        new: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + f
        vocab = new
    return merges


def test_q157_matches_python_trainer(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    ]
    want = _python_bpe_merges(texts)
    got = [
        (r.step, r.s1, r.s2, r.cnt)
        for r in q157_bpe_merge_train(spark, SF).orderBy("step").collect()
    ]
    assert got == want


def test_q157_greedy_nonoverlapping_merge(spark):
    # 'aaa</w>' with merge (a,a) must become ('aa','a','</w>'), never
    # ('a','aa','</w>') or ('aa','aa...') — the true left-to-right pass
    s1, s2 = "\x01", "\x02"
    w = spark.createDataFrame(
        [(s1 + "a" + s2 + s1 + "a" + s2 + s1 + "a" + s2 + s1 + "</w>" + s2, 1)],
        "s string, freq long",
    )
    m = spark.createDataFrame([("a", "a")], "s1 string, s2 string")
    (row,) = _bpe_apply_merge(w, m).collect()
    assert row.s == s1 + "aa" + s2 + s1 + "a" + s2 + s1 + "</w>" + s2
    pairs = {
        (r.s1, r.s2): r.cnt for r in _bpe_adjacent_pairs(w.select("s", "freq")).collect()
    }
    assert pairs == {("a", "a"): 2, ("a", "</w>"): 1}
