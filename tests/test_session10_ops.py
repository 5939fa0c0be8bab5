"""Round-5 session-10 pins for the corpus-release trio:

- q165 fuzzy decontamination: benchmark docs never appear in the output,
  every zero-candidate doc reports exact zeros, the sub-threshold branch
  (candidates verified but below 500 permille) is non-empty on the
  fixture, and the flagged docs really share >= theta of their trigram
  shingle set with some benchmark doc (pure-Python recount);
- q166 leakage-free split: every near-dup cluster maps to exactly ONE
  split (the invariant that makes it leakage-free), every document is
  assigned, and the split tag is the md5-of-cluster-id bucket;
- q167 source sample audit: per-source ranks are a 1..min(k, n)
  permutation, the sample is the k smallest md5(doc_id) keys per source
  (pure-Python recount), and a rerun is byte-identical;
- none of the three plans a partition-less Window (the registry-wide
  discipline test_round5_fixes pins for everything else).
"""

from __future__ import annotations

import hashlib
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    _BENCH_MOD,
    _FUZ_THETA,
    _Q167_K,
    q165_fuzzy_decontamination,
    q166_leakage_free_split,
    q167_source_sample_audit,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def _shingle_set(text: str) -> set[str]:
    ws = text.split(" ")
    if len(ws) < 3:
        return {text}
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_q165_flags_true_fuzzy_overlap(spark):
    rows = {r.doc_id: r for r in q165_fuzzy_decontamination(spark, SF).collect()}
    docs = _docs(spark)
    bench = {i for i in docs if i % _BENCH_MOD == 0}
    # benchmark docs are never scored; every train doc is
    assert set(rows) == set(docs) - bench
    sub = [r for r in rows.values() if 0 < r.max_jac_permille < _FUZ_THETA]
    hit = [r for r in rows.values() if r.contaminated]
    zero = [r for r in rows.values() if r.max_jac_permille == 0]
    assert sub and hit and zero  # all three verdict branches on fixture
    for r in zero:
        assert r.n_bench_matches == 0 and not r.contaminated
    # flagged docs really share >= theta permille of their shingle set
    # with some benchmark doc (exact integer permille, as implemented)
    for r in hit:
        s = _shingle_set(docs[r.doc_id])
        best = max(
            (1000 * len(s & _shingle_set(docs[b]))) // len(s | _shingle_set(docs[b]))
            for b in bench
        )
        assert best >= _FUZ_THETA
        assert r.max_jac_permille == best


def test_q166_split_never_straddles_a_cluster(spark):
    rows = q166_leakage_free_split(spark, SF).collect()
    docs = _docs(spark)
    assert {r.doc_id for r in rows} == set(docs)  # total assignment
    by_cluster = defaultdict(set)
    for r in rows:
        by_cluster[r.cluster_id].add(r.split)
        assert r.split in ("train", "val", "test")
        # split tag is a pure function of the CLUSTER id
        h = int(hashlib.md5(str(r.cluster_id).encode()).hexdigest()[:4], 16) % 10
        want = "train" if h <= 7 else ("val" if h == 8 else "test")
        assert r.split == want
    assert all(len(s) == 1 for s in by_cluster.values())
    assert any(
        len([r for r in rows if r.cluster_id == c]) > 1 for c in by_cluster
    ), "fixture must contain multi-doc clusters for the pin to mean anything"


def test_q167_sample_is_k_smallest_hash_keys_per_source(spark):
    rows = q167_source_sample_audit(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    ).collect()
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append(r.doc_id)
    got = defaultdict(dict)
    for r in rows:
        got[r.source][r.doc_id] = r.sample_rank
    assert set(got) == set(by_src)
    for src, ids in by_src.items():
        want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want = want[: min(_Q167_K, len(ids))]
        assert sorted(got[src]) == sorted(want)
        assert sorted(got[src].values()) == list(range(1, len(want) + 1))
    # deterministic: a rerun is identical
    again = {(r.doc_id, r.source, r.sample_rank) for r in
             q167_source_sample_audit(spark, SF).collect()}
    assert again == {(r.doc_id, r.source, r.sample_rank) for r in rows}


def test_new_trio_plans_no_unpartitioned_window(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "window_audit", "/root/repo/tools/window_audit.py"
    )
    wa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wa)
    for q in (
        q165_fuzzy_decontamination,
        q166_leakage_free_split,
        q167_source_sample_audit,
    ):
        assert wa.global_windows(q(spark, SF)) == [], q.__name__
