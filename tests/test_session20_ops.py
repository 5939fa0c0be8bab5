"""Session-20 operators against pure-Python recounts:

- q197 Poisson-bootstrap CI: full deterministic recount (md5 20-bit
  uniforms -> fixed-point Poisson(1) weights -> replicate rates ->
  triangular ranks) + sanity pins (point inside CI, width positive,
  weights follow the CDF table);
- q198 Neyman allocation: full recount (integer radicand N*syy - sy^2,
  floor-sqrt, largest-remainder apportionment) + pins (allocations sum
  to the budget exactly, variance-heavy strata oversampled, allocation
  differs from proportional somewhere).
"""

from __future__ import annotations

import collections
import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.001"
R, MINW = 40, 30
CDF = (385749, 771499, 964373, 1028665, 1044738, 1047952)
BUDGET = 1000


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _w(r, doc_id):
    u = int(hashlib.md5(f"{r}:{doc_id}".encode()).hexdigest()[:5], 16)
    for w, t in enumerate(CDF):
        if u < t:
            return w
    return 6


# ----------------------------------------------------------------- q197
def _py_bootstrap():
    docs = [(d, 1 if len(t.split(" ")) >= MINW else 0) for d, t, _s in _docs()]
    ms = []
    for r in range(R):
        wt = wk = 0
        for d, keep in docs:
            w = _w(r, d)
            wt += w
            wk += w * keep
        ms.append((1000 * wk) // wt)
    point = (1000 * sum(k for _d, k in docs)) // len(docs)
    ordered = sorted(ms)
    return (
        point,
        R,
        sum(ms) // R,
        ordered[0],
        ordered[R - 2],
        ordered[R - 2] - ordered[0],
    )


def test_q197_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q197_poisson_bootstrap_ci,
    )

    want = _py_bootstrap()
    rows = q197_poisson_bootstrap_ci(spark, SF).collect()
    assert len(rows) == 1
    got = tuple(rows[0])
    assert got == want
    point, _n, _mean, lo, hi, width = got
    assert lo <= point <= hi and width > 0


def test_q197_weights_follow_the_cdf_table():
    """The fixed-point inverse-CDF really produces Poisson(1)-ish mass:
    mean weight near 1, weight 0 frequency near 1/e."""
    n = 2000
    ws = [_w(r, d) for r in range(4) for d in range(n // 4)]
    assert abs(sum(ws) / len(ws) - 1.0) < 0.1
    assert abs(sum(1 for w in ws if w == 0) / len(ws) - math.exp(-1)) < 0.05


# ----------------------------------------------------------------- q198
def _py_neyman():
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for _d, t, s in _docs():
        y = len(t.split(" "))
        a = agg[s]
        a[0] += 1
        a[1] += y
        a[2] += y * y
    ns = {s: int(math.floor(math.sqrt(n * syy - sy * sy))) for s, (n, sy, syy) in agg.items()}
    ns_tot = sum(ns.values())
    n_tot = sum(a[0] for a in agg.values())
    base = {s: (BUDGET * v) // ns_tot for s, v in ns.items()}
    rem = {s: (BUDGET * v) % ns_tot for s, v in ns.items()}
    leftover = BUDGET - sum(base.values())
    order = sorted(agg, key=lambda s: (-rem[s], s))
    bonus = set(order[:leftover])
    out = {}
    for s, (n, sy, _syy) in agg.items():
        alloc = base[s] + (1 if s in bonus else 0)
        prop = (BUDGET * n) // n_tot
        out[s] = (n, sy, ns[s], alloc, prop, alloc > prop)
    return out


def test_q198_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q198_neyman_allocation,
    )

    want = _py_neyman()
    got = {
        r.source: (
            r.n_docs,
            r.sum_words,
            r.ns,
            r.alloc_docs,
            r.proportional_docs,
            r.oversampled,
        )
        for r in q198_neyman_allocation(spark, SF).collect()
    }
    assert got == want
    # Hamilton rounding: the seats sum EXACTLY to the budget
    assert sum(v[3] for v in got.values()) == BUDGET
    # the design is non-trivial: some stratum deviates from proportional
    assert any(v[3] != v[4] for v in got.values())
    # and the deviations follow variance: every oversampled stratum has a
    # larger Neyman weight than every undersampled one of the same size
    over = [v[2] for v in got.values() if v[5]]
    under = [v[2] for v in got.values() if v[3] < v[4]]
    if over and under:
        assert min(over) > min(under)
