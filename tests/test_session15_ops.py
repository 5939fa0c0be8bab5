"""Session-15 operators: q183 crawl-ordering strategy evaluation."""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

from tests.test_session14_ops import _opic_importance_py  # noqa: E402

SF = "/root/testdata/sf0.001"


def _ntile(rank, total, k):
    m = total % k
    small = total // k
    big = small + 1
    if rank <= m * big:
        return (rank + small) // big
    return m + (rank - m * big + small - 1) // small


def _q183_brute(spark):
    from webscraping_video_pipeline_spark.contract.graph import _COE_K

    doc_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    n = len(doc_ids)
    imp = _opic_importance_py(doc_ids)
    edges = set()
    for d in doc_ids:
        for j in range(1, 4):
            h = hashlib.md5(f"{d}:{j}".encode()).hexdigest()
            dst = int(h[:8], 16) % n
            if dst != d:
                edges.add((d, dst))
    ind = {d: 0 for d in doc_ids}
    outd = {d: 0 for d in doc_ids}
    for s, t_ in edges:
        outd[s] += 1
        ind[t_] += 1
    rnd = {d: hashlib.md5(str(d).encode()).hexdigest() for d in doc_ids}
    orders = {
        "random": sorted(doc_ids, key=lambda d: (rnd[d], d)),
        "indegree": sorted(doc_ids, key=lambda d: (-ind[d], d)),
        "outdegree": sorted(doc_ids, key=lambda d: (-outd[d], d)),
        "opic": sorted(doc_ids, key=lambda d: (-imp[d], d)),
    }
    tot = sum(imp.values())
    want = {}
    for strat, order in orders.items():
        cap = {q: 0 for q in range(1, _COE_K + 1)}
        for i, d in enumerate(order):
            cap[_ntile(i + 1, n, _COE_K)] += imp[d]
        cum = 0
        for q in range(1, _COE_K + 1):
            cum += cap[q]
            want[(strat, q)] = ((1000 * cap[q]) // tot, (1000 * cum) // tot)
    return want


def test_q183_matches_bruteforce_recount(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q183_crawl_order_eval,
    )

    want = _q183_brute(spark)
    got = {
        (r.strategy, r.decile): (r.captured_permille, r.cum_captured_permille)
        for r in q183_crawl_order_eval(spark, SF).collect()
    }
    assert got == want


def test_q183_fixture_is_discriminating(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        _COE_K,
        q183_crawl_order_eval,
    )

    rows = q183_crawl_order_eval(spark, SF).collect()
    by = {(r.strategy, r.decile): r for r in rows}
    strategies = {"random", "indegree", "outdegree", "opic"}
    assert {s for s, _ in by} == strategies
    assert len(rows) == len(strategies) * _COE_K
    for s in strategies:
        curve = [by[(s, q)].cum_captured_permille for q in range(1, _COE_K + 1)]
        # cumulative curves are monotone and end at the whole corpus
        assert curve == sorted(curve)
        assert curve[-1] == 1000
    # the ordering signal genuinely separates the strategies: the OPIC
    # ceiling dominates random at every interior budget and is strictly
    # better somewhere; indegree (the paper's cheap signal) also beats
    # random early
    opic = [by[("opic", q)].cum_captured_permille for q in range(1, _COE_K)]
    rand = [by[("random", q)].cum_captured_permille for q in range(1, _COE_K)]
    ind = [by[("indegree", q)].cum_captured_permille for q in range(1, _COE_K)]
    assert all(o >= r for o, r in zip(opic, rand))
    assert any(o > r for o, r in zip(opic, rand))
    assert ind[0] > rand[0]
    # opic's first decile is the best possible first decile
    assert by[("opic", 1)].cum_captured_permille == max(
        by[(s, 1)].cum_captured_permille for s in strategies
    )


# ------------------------------------------------------------------ q184
def _q184_brute(spark):
    from webscraping_video_pipeline_spark.contract.text import (
        _SCV_CONFIGS,
        _SCV_H,
        _SCV_TAU,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    sh = {}
    for r in docs:
        ws = r.text.split(" ")
        if len(ws) >= 3:
            sh[r.doc_id] = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        else:
            sh[r.doc_id] = [r.text]
    mh = {
        d: [
            min(hashlib.md5(f"{s}#{k}".encode()).hexdigest() for s in ss)
            for k in range(_SCV_H)
        ]
        for d, ss in sh.items()
    }
    # exact-Jaccard ground truth over distinct shingles
    dset = {d: set(ss) for d, ss in sh.items()}
    ids = sorted(dset)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            iv = len(dset[a] & dset[b])
            if iv and (1000 * iv) // (len(dset[a]) + len(dset[b]) - iv) >= _SCV_TAU:
                truth.add((a, b))
    want = {}
    for nb, rpb in _SCV_CONFIGS:
        cand = set()
        buckets: dict = {}
        for d, sig in mh.items():
            for i in range(nb):
                key = (i, "".join(sig[i * rpb : (i + 1) * rpb]))
                buckets.setdefault(key, []).append(d)
        for mem in buckets.values():
            mem.sort()
            for i, a in enumerate(mem):
                for b in mem[i + 1 :]:
                    cand.add((a, b))
        hits = len(cand & truth)
        want[f"{nb}x{rpb}"] = (
            nb,
            rpb,
            len(cand),
            hits,
            len(truth),
            (1000 * hits) // max(len(truth), 1),
            (1000 * hits) // max(len(cand), 1),
        )
    return want


def test_q184_matches_bruteforce_recount(spark):
    from webscraping_video_pipeline_spark.contract.text import (
        q184_lsh_banding_calibration,
    )

    want = _q184_brute(spark)
    got = {
        r.config: (
            r.n_bands,
            r.rows_per_band,
            r.n_candidates,
            r.n_hits,
            r.n_true_pairs,
            r.recall_permille,
            r.precision_permille,
        )
        for r in q184_lsh_banding_calibration(spark, SF).collect()
    }
    assert got == want


def test_q184_fixture_is_discriminating(spark):
    from webscraping_video_pipeline_spark.contract.text import (
        _SCV_CONFIGS,
        q184_lsh_banding_calibration,
    )

    rows = {
        r.config: r for r in q184_lsh_banding_calibration(spark, SF).collect()
    }
    assert set(rows) == {f"{b}x{r}" for b, r in _SCV_CONFIGS}
    # ground truth is non-trivial and shared across configs
    nt = {r.n_true_pairs for r in rows.values()}
    assert len(nt) == 1 and nt.pop() > 0
    # along the b-descending sweep (many narrow bands -> few wide bands):
    # candidate volume and recall never increase, precision never falls —
    # the S-curve trade the calibration exists to expose
    ordered = [rows[f"{b}x{r}"] for b, r in _SCV_CONFIGS]
    for a, b in zip(ordered, ordered[1:]):
        assert a.n_candidates >= b.n_candidates
        assert a.recall_permille >= b.recall_permille
        assert a.precision_permille <= b.precision_permille
    # the extremes genuinely differ: the sweep is not flat
    assert ordered[0].recall_permille > ordered[-1].recall_permille
    assert ordered[0].precision_permille < ordered[-1].precision_permille
    # every hit is a candidate; recall ceiling respected
    for r in rows.values():
        assert 0 <= r.n_hits <= min(r.n_candidates, r.n_true_pairs)
