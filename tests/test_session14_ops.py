"""Round-5 session-14 pins for q181 retrieval-quality evaluation
(nDCG@10 + MRR@10 of the q87 BM25 ranking vs deterministic graded
qrels):

- every (n_rel, dcg_micro, idcg_micro, ndcg_permille, first_full_rank,
  rr_micro) row matches a pure-Python brute-force recount (float BM25
  per term, decimal(27,12) HALF_UP quantization per (term, doc) score —
  the cross-engine idiom — exact Decimal sums, full sorts);
- the fixture is discriminating: the rare-term queries (1, 3) produce a
  GENUINE divergence between BM25 order and ideal order (ndcg < 1000,
  partially-relevant docs inside the top-10) and the common-term query
  (2) produces a perfect ranking (ndcg = 1000, first_full_rank = 1) —
  both verdict classes appear, and some query has first_full_rank > 1
  so the MRR arm is non-trivially exercised;
- integer identities: ndcg_permille = (1000*dcg) div idcg, rr_micro =
  10^6 div first_full_rank, dcg <= idcg always.
"""

from __future__ import annotations

import math
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.ingest import (  # noqa: E402
    _BM25_B,
    _BM25_K1,
    _IR_K,
    _IR_QUERIES,
    _IR_W_MICRO,
    q181_retrieval_ndcg_eval,
)

SF = "/root/testdata/sf0.001"
_Q = Decimal("1e-12")


def _brute_rows(spark):
    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    terms = sorted({w for ts in _IR_QUERIES.values() for w in ts})
    tf: dict[tuple[int, str], int] = {}
    for d, ws in docs.items():
        for w in ws:
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {t: sum(1 for d in docs if (d, t) in tf) for t in terms}
    nd = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / nd
    want = {}
    for qid, ts in _IR_QUERIES.items():
        entries = []
        for d, ws in docs.items():
            present = [t for t in ts if (d, t) in tf]
            if not present:
                continue
            s = Decimal(0)
            for t_ in present:
                idf = math.log(1.0 + ((nd - df[t_]) + 0.5) / (df[t_] + 0.5))
                tfv = float(tf[(d, t_)])
                dl = len(docs[d])
                sc = idf * (
                    (tfv * (_BM25_K1 + 1.0))
                    / (tfv + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * (dl / avgdl)))
                )
                s += Decimal(sc).quantize(_Q, rounding=ROUND_HALF_UP)
            entries.append((d, len(present), s))
        ranked = sorted(entries, key=lambda e: (-e[2], e[0]))[:_IR_K]
        ideal = sorted(entries, key=lambda e: (-e[1], e[0]))[:_IR_K]
        dcg = sum(rel * _IR_W_MICRO[i] for i, (_, rel, _s) in enumerate(ranked))
        idcg = sum(rel * _IR_W_MICRO[i] for i, (_, rel, _s) in enumerate(ideal))
        ffr = next(
            (i + 1 for i, (_, rel, _s) in enumerate(ranked) if rel == len(ts)), 0
        )
        want[qid] = (
            len(entries),
            dcg,
            idcg,
            (1000 * dcg) // idcg,
            ffr,
            1000000 // ffr if ffr else 0,
        )
    return want


def test_q181_matches_bruteforce_recount(spark):
    want = _brute_rows(spark)
    got = {
        r.query_id: (
            r.n_rel,
            r.dcg_micro,
            r.idcg_micro,
            r.ndcg_permille,
            r.first_full_rank,
            r.rr_micro,
        )
        for r in q181_retrieval_ndcg_eval(spark, SF).collect()
    }
    assert got == want


def test_q181_fixture_is_discriminating(spark):
    rows = {r.query_id: r for r in q181_retrieval_ndcg_eval(spark, SF).collect()}
    assert set(rows) == set(_IR_QUERIES)
    # rare-term queries diverge from the ideal order; the common-term
    # query ranks perfectly — both verdict classes must appear
    assert any(r.ndcg_permille < 1000 for r in rows.values())
    assert any(r.ndcg_permille == 1000 for r in rows.values())
    # the MRR arm must be non-trivial on at least one query
    assert any(r.first_full_rank > 1 for r in rows.values())
    for r in rows.values():
        assert r.n_rel >= _IR_K, "rank windows must bind (n_rel >= k)"
        assert 0 < r.dcg_micro <= r.idcg_micro
        assert r.ndcg_permille == (1000 * r.dcg_micro) // r.idcg_micro
        assert r.first_full_rank >= 1
        assert r.rr_micro == 1000000 // r.first_full_rank


# ------------------------------------------------------------------ q182
def _opic_importance_py(doc_ids):
    """Pure-Python integer-picocash OPIC recount: the same md5 link graph
    as contract/graph.py's _link_graph (directed, distinct, no
    self-loops), 3 synchronous rounds of floor-division cash transfer
    with uniform dangling redistribution."""
    import hashlib

    from webscraping_video_pipeline_spark.contract.graph import (
        _OPIC_ITERS,
        _OPIC_POOL,
    )

    n = len(doc_ids)
    edges = set()
    for d in doc_ids:
        for j in range(1, 4):
            h = hashlib.md5(f"{d}:{j}".encode()).hexdigest()
            dst = int(h[:8], 16) % n
            if dst != d:
                edges.add((d, dst))
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    cash = {d: _OPIC_POOL // n for d in doc_ids}
    hist = {d: 0 for d in doc_ids}
    for _ in range(_OPIC_ITERS):
        contrib = {d: 0 for d in doc_ids}
        for s, t_ in edges:
            contrib[t_] += cash[s] // out[s]
        dang = sum(c for d, c in cash.items() if d not in out)
        new_cash = {d: contrib[d] + dang // n for d in doc_ids}
        for d in doc_ids:
            hist[d] += cash[d]
        cash = new_cash
    return {d: hist[d] + cash[d] for d in doc_ids}


def _q182_brute(spark):
    from webscraping_video_pipeline_spark.contract.graph import _RP_SHARE

    doc_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    imp = {d: p // 10**6 for d, p in _opic_importance_py(doc_ids).items()}
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    hist: dict[int, list] = {}
    for r in ev:
        hist.setdefault(r.user_id % 200, []).append(
            (r.ts, r.event_id, int(math.floor(r.value)) % 2)
        )
    horizon = max(r.ts for r in ev)
    per = {}
    for u, rows in hist.items():
        rows.sort(key=lambda x: (x[0], x[1]))
        nf = len(rows)
        nc = sum(1 for a, b in zip(rows, rows[1:]) if a[2] != b[2])
        first_ts, last_ts = rows[0][0], rows[-1][0]
        per[u] = (nf, nc, first_ts, last_ts)
    # engines floor EACH timestamp to epoch seconds before subtracting
    # (unix_timestamp / date_diff('second') semantics) — truncating the
    # difference instead is off by one whenever the fractional parts
    # straddle a second boundary
    def _epoch(ts):
        import calendar

        return calendar.timegm(ts.timetuple())

    want = {}
    for d in doc_ids:
        if d in per:
            nf, nc, first_ts, last_ts = per[d]
            stale = _epoch(horizon) - _epoch(last_ts)
            cr = (1000 * (nc + 1)) // (nf + 1)
            gap = max((_epoch(last_ts) - _epoch(first_ts)) // max(nf - 1, 1), 1)
            risk = min(1000, (cr * stale) // gap)
        else:
            nf = nc = stale = 0
            cr = risk = 1000
        want[d] = (nf, nc, stale, cr, risk, imp[d], imp[d] * risk)
    order = sorted(doc_ids, key=lambda d: (-want[d][6], d))
    rank = {d: i + 1 for i, d in enumerate(order)}
    budget = len(doc_ids) // _RP_SHARE
    return {
        d: want[d] + (rank[d], rank[d] <= budget) for d in doc_ids
    }


def test_q182_matches_bruteforce_recount(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q182_recrawl_priority,
    )

    want = _q182_brute(spark)
    got = {
        r.url_id: (
            r.n_fetches,
            r.n_changes,
            r.staleness_s,
            r.cr_permille,
            r.risk_permille,
            r.importance_micro,
            r.gain_units,
            r.fetch_rank,
            r.selected,
        )
        for r in q182_recrawl_priority(spark, SF).collect()
    }
    assert got == want


def test_q182_fixture_is_discriminating(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        _RP_SHARE,
        q182_recrawl_priority,
    )

    rows = q182_recrawl_priority(spark, SF).collect()
    n = len(rows)
    # rank is a permutation and the budget head is exact
    assert sorted(r.fetch_rank for r in rows) == list(range(1, n + 1))
    assert sum(r.selected for r in rows) == n // _RP_SHARE
    fetched = [r for r in rows if r.n_fetches > 0]
    never = [r for r in rows if r.n_fetches == 0]
    # discovery and refresh genuinely compete in one ranking
    assert fetched and never
    assert any(r.selected for r in never)
    assert all(r.risk_permille == 1000 and r.cr_permille == 1000 for r in never)
    # the saturation clamp binds for some fetched URL and not others
    assert any(r.risk_permille == 1000 for r in fetched)
    assert any(0 < r.risk_permille < 1000 for r in fetched)
    # Laplace smoothing keeps every fetched change-rate strictly inside
    # (0, 1000) — the estimator never claims certainty
    assert all(0 < r.cr_permille < 1000 for r in fetched)
    for r in rows:
        assert r.gain_units == r.importance_micro * r.risk_permille
