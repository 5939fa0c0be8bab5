"""Round-5 session-11 pins for the retrieval/eval quartet:

- q168 classifier PR sweep: the confusion matrix at every threshold
  partitions the corpus exactly, tp is non-increasing and tn
  non-decreasing in the threshold (the sweep is a real operating
  curve), and the thr=0 row matches a pure-Python recount of the q78
  score against the stop-word weak label;
- q169 weighted reservoir sample: per-host ranks are a 1..min(k, n)
  permutation and the selected set per host is EXACTLY the k largest
  ln(u)/w keys recomputed in pure Python (A-Res, Efraimidis &
  Spirakis) — i.e. the sample is reproducible from the spec alone;
- q170 tokenizer fertility: per-word token counts are bounded by
  construction (1 <= n_tokens <= chars+1 per occurrence, so the lang
  totals nest between occurrences and chars+occurrences), every lang
  appears exactly once, and the lang totals sum to q163's global
  corpus-weighted token total (the two queries share one tokenizer);
- q171 BM25 hard negatives: no emitted doc matches ALL its query's
  terms (positives are excluded by definition), ranks are a dense
  1..min(N, candidates) prefix per query, and query 1's ranking
  matches a pure-Python BM25 recount.
"""

from __future__ import annotations

import hashlib
import math
import sys
from collections import Counter, defaultdict

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.crawl_ops import (  # noqa: E402
    _WRS_HOSTS,
    _WRS_K,
    q169_weighted_reservoir_sample,
)
from webscraping_video_pipeline_spark.contract.ingest import (  # noqa: E402
    _BM25_B,
    _BM25_K1,
    _HN_QUERIES,
    _HN_TOPN,
    q171_bm25_hard_negatives,
)
from webscraping_video_pipeline_spark.contract.lm import (  # noqa: E402
    q163_bpe_encode_tokens,
    q170_tokenizer_fertility,
)
from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    _PRS_LABEL_PERMILLE,
    _PRS_STOPS,
    _PRS_THRESHOLDS,
    q168_classifier_pr_sweep,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return {
        r.doc_id: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _q78_score(text: str) -> float:
    ws = text.lower().split(" ")
    # decimal(27,12)-exact sum: quantize each weight to 12 decimals
    total = 0
    for w in ws:
        x = _u32(w) / 4294967296.0 * 2.0 - 1.0
        total += round(x * 10**12)
    return (total / 10**12) / len(ws)


def test_q168_sweep_is_operating_curve(spark):
    rows = {r.threshold_permille: r for r in q168_classifier_pr_sweep(spark, SF).collect()}
    assert sorted(rows) == sorted(_PRS_THRESHOLDS)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    for r in rows.values():
        assert r.tp + r.fp + r.fn + r.tn == n_docs
        assert r.tp + r.fn == rows[0].tp + rows[0].fn  # label count is fixed
    ts = sorted(rows)
    for a, b in zip(ts, ts[1:]):
        assert rows[b].tp <= rows[a].tp  # raising the bar only drops docs
        assert rows[b].tn >= rows[a].tn
    # thr=0 row against a pure-Python recount
    tp = fp = fn = tn = 0
    for d in _docs(spark).values():
        ws = d.text.lower().split(" ")
        lab = 1000 * sum(1 for w in ws if w in _PRS_STOPS) >= _PRS_LABEL_PERMILLE * len(ws)
        pred = _q78_score(d.text) > 0.0
        tp += pred and lab
        fp += pred and not lab
        fn += (not pred) and lab
        tn += (not pred) and not lab
    r0 = rows[0]
    assert (r0.tp, r0.fp, r0.fn, r0.tn) == (tp, fp, fn, tn)
    if tp + fp:
        assert r0.precision_permille == 1000 * tp // (tp + fp)


def test_q169_sample_is_ares_topk(spark):
    rows = q169_weighted_reservoir_sample(spark, SF).collect()
    docs = _docs(spark)
    # pure-Python A-Res recount
    per_host = defaultdict(list)
    for doc_id, d in docs.items():
        u = (_u32(f"wrs:{doc_id}") + 1.0) / 4294967296.0
        key = math.log(u) / d.n_chars
        per_host[f"h{doc_id % _WRS_HOSTS}"].append((-key, doc_id))
    expect = {
        h: [doc for _, doc in sorted(v)[: _WRS_K]] for h, v in per_host.items()
    }
    got = defaultdict(dict)
    for r in rows:
        got[r.host][r.sample_rank] = r.doc_id
        assert r.weight == docs[r.doc_id].n_chars
    assert set(got) == set(expect)
    for h, ranks in got.items():
        assert sorted(ranks) == list(range(1, min(_WRS_K, len(per_host[h])) + 1))
        assert [ranks[i] for i in sorted(ranks)] == expect[h]


def test_q170_fertility_nests_and_sums_to_q163(spark):
    rows = q170_tokenizer_fertility(spark, SF).collect()
    langs = [r.lang for r in rows]
    assert len(langs) == len(set(langs))
    for r in rows:
        # 1 <= tokens-per-occurrence <= chars-per-occurrence + 1 (</w>)
        assert r.n_word_occurrences <= r.total_tokens
        assert r.total_tokens <= r.total_chars + r.n_word_occurrences
        assert r.fertility_millitokens == 1000 * r.total_tokens // r.n_word_occurrences
        assert r.millichars_per_token == 1000 * r.total_chars // r.total_tokens
    enc = q163_bpe_encode_tokens(spark, SF).collect()
    assert sum(r.total_tokens for r in rows) == sum(r.tok_total for r in enc)
    assert sum(r.n_word_occurrences for r in rows) == sum(r.freq for r in enc)


def test_q171_negatives_exclude_positives_and_match_bm25(spark):
    rows = q171_bm25_hard_negatives(spark, SF).collect()
    docs = _docs(spark)
    tok = {i: d.text.lower().split(" ") for i, d in docs.items()}
    nd = len(tok)
    avgdl = sum(len(ws) for ws in tok.values()) / nd
    all_terms = {w for ts in _HN_QUERIES.values() for w in ts}
    df = Counter()
    tf = defaultdict(Counter)
    for i, ws in tok.items():
        c = Counter(w for w in ws if w in all_terms)
        for term, n in c.items():
            df[term] += 1
            tf[i][term] = n

    def bm25(i, term):
        idf = math.log(1.0 + (nd - df[term] + 0.5) / (df[term] + 0.5))
        f = tf[i][term]
        raw = idf * (f * (_BM25_K1 + 1.0)) / (
            f + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * len(tok[i]) / avgdl)
        )
        return round(raw * 10**12)  # decimal(27,12) quantization

    by_q = defaultdict(dict)
    for r in rows:
        terms = _HN_QUERIES[r.query_id]
        assert r.n_match_terms < len(terms)  # positives never emitted
        assert r.n_match_terms == sum(1 for w in terms if tf[r.doc_id][w] > 0)
        by_q[r.query_id][r.hard_rank] = r.doc_id
    for qid, terms in _HN_QUERIES.items():
        cand = [
            (-sum(bm25(i, w) for w in terms if tf[i][w] > 0), i)
            for i in tok
            if 0 < sum(1 for w in terms if tf[i][w] > 0) < len(terms)
        ]
        expect = [i for _, i in sorted(cand)[:_HN_TOPN]]
        ranks = by_q[qid]
        assert sorted(ranks) == list(range(1, min(_HN_TOPN, len(cand)) + 1))
        assert [ranks[k] for k in sorted(ranks)] == expect
