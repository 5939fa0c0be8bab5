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
