"""Round-5 session-12 pins for q172 embedding-space decontamination:

- the output partitions the embeddings table exactly: one row per CORPUS
  vector (vec_id % 20 != 0), no benchmark vector ever appears as a row;
- every (nearest_bench_id, max_cosine, contaminated) triple matches a
  pure-Python recount of the spec — exhaustive max cosine over the whole
  benchmark split with the same decimal(27,12)-quantized dot/norm folds
  both engines use, argmax ties broken to the LOWEST bench id — so the
  query is reproducible from its docstring alone (the q169 discipline);
- the verdict column is exactly max_cosine >= tau (no drift between the
  flag and the score it claims to threshold), and the fixture exercises
  both verdicts;
- plan shape (the kmeans packed-broadcast argmin idiom): the bench set
  arrives as ONE broadcast row and the per-vector arg-max runs inside a
  projection (array_min over per-bench struct(-cosine, bench_id)) — a
  broadcast nested-loop join with NO window operator, NO sort-aggregate
  (the crossJoin+max(struct) form kmeans.py measured ~6x slower), and
  exactly one shuffle exchange (packing the bench rows — bench-sized).

And for q173 duplicate-span extraction:

- the emitted spans match a pure-Python recount of the spec exactly
  (shingle census -> >= 2-distinct-doc positions -> merged runs);
- spans are maximal and disjoint: within a doc they never touch or
  overlap, every in-span shingle start is duplicated, and extending any
  span by one position in either direction leaves the duplicated set;
- every span is at least _SPAN_K tokens and lies inside its document.

And for q174 HyperLogLog URL cardinality:

- registers, harmonic sums, raw estimates, zero counts, and err_permille
  all match a pure-Python recount bit-exactly (dyadic 2^-rho sums are
  order-free exact doubles); the estimate sits inside a 4-sigma HLL
  error envelope of the exact distinct count;
- a planted 5-URL corpus drives the small-range linear-counting arm the
  sf fixtures never reach (raw <= 2.5m with zero registers present) and
  its estimate equals m*ln(m/V) from the recount.

And for q175 margin-based bitext mining:

- the emitted pairs are exactly the mutual cross-lingual nearest
  neighbors of a pure-Python recount, with bit-exact cosines and ratio
  margins (identical decimal folds), theta splitting the fixture into
  accepted and rejected pairs;
- mutual NN is a partial matching: no src or en doc appears twice;
- the plan is two packed-broadcast projection passes (one per
  direction) — no window, no sort-aggregate.

And for q177 HDR-histogram latency quantile sketch:

- bucket counts, bucket cardinalities, and every P50/P90/P99 lower
  bound match a pure-Python recount of the all-integer (exponent,
  sub-bucket) bucketing; each estimate obeys the one-sided HDR
  guarantee against the TRUE k-th order statistic (rel error <= 2^-s);
- bucket counts are additive under arbitrary splits (mergeability).

And for q178 duplicate-cluster size histogram:

- the histogram matches a pure-Python rollup of certified q50 output +
  token counts; accounting identities hold (every doc and token counted
  exactly once, singletons remove nothing, keeper tokens never removed).
"""

from __future__ import annotations

import hashlib
import math
import sys

import pytest
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    _SPAN_K,
    q173_duplicate_span_extraction,
)
from webscraping_video_pipeline_spark.contract.similarity import (  # noqa: E402
    _DECON_MOD,
    _DECON_TAU,
    q172_embedding_decontamination,
)

SF = "/root/testdata/sf0.001"

_Q = Decimal("1e-12")


def _fold(parts) -> float:
    """decimal(27,12)-exact additive fold: quantize each product HALF_UP
    to 12 decimals (Spark/DuckDB decimal cast semantics), sum exactly,
    return as double — bit-identical to both engines' plans."""
    total = Decimal(0)
    for p in parts:
        total += Decimal(p).quantize(_Q, rounding=ROUND_HALF_UP)
    return float(total)


def test_q172_matches_pure_python_recount(spark):
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    nrm = {i: _fold(x * x for x in v) for i, v in vecs.items()}
    bench = {i: v for i, v in vecs.items() if i % _DECON_MOD == 0}
    corpus = {i: v for i, v in vecs.items() if i % _DECON_MOD != 0}
    assert bench and corpus

    rows = {r.vec_id: r for r in q172_embedding_decontamination(spark, SF).collect()}
    assert set(rows) == set(corpus)  # exact partition: every corpus vec, no bench vec

    n_contam = 0
    for cid, cv in corpus.items():
        best = max(
            (
                _fold(x * y for x, y in zip(cv, bv)) / math.sqrt(nrm[cid] * nrm[bid]),
                -bid,
            )
            for bid, bv in bench.items()
        )
        r = rows[cid]
        assert r.nearest_bench_id == -best[1]
        assert r.max_cosine == best[0]  # same IEEE ops -> bit-identical
        assert r.contaminated == (best[0] >= _DECON_TAU)
        n_contam += r.contaminated
    assert 0 < n_contam < len(corpus)  # fixture exercises both verdicts


def test_q172_plan_is_broadcast_screen_single_agg(spark):
    plan = q172_embedding_decontamination(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # bench side broadcast, corpus never shuffles
    assert "Window" not in plan  # arg-max is an in-projection array_min, not a ranked window
    assert "SortAggregate" not in plan  # the kmeans.py lesson: no max(struct) over crossed rows
    # exactly two shuffles: packing the bench rows (bench-sized) and the
    # fixture-only round-robin spread of the corpus scan; the corpus side
    # past the spread is join -> project with no exchange and no aggregate
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 2
    assert "RoundRobinPartitioning" in plan  # the spread, not a key shuffle


def _expected_spans(spark):
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    by_sh = defaultdict(set)
    starts = defaultdict(list)
    for doc_id, ws in docs.items():
        for i in range(1, len(ws) - _SPAN_K + 2):
            sh = " ".join(ws[i - 1 : i - 1 + _SPAN_K])
            by_sh[sh].add(doc_id)
            starts[doc_id].append((i, sh))
    dup = {sh for sh, d in by_sh.items() if len(d) >= 2}
    # coverage per doc: union of [i, i+K-1] over duplicated starts; spans
    # are the maximal covered intervals (starts merge iff gap <= K)
    cov, spans = defaultdict(set), set()
    for doc_id, pos in starts.items():
        run = []
        for i, sh in pos + [(None, None)]:
            if sh in dup:
                cov[doc_id].update(range(i, i + _SPAN_K))
                if run and i - run[-1] > _SPAN_K:
                    spans.add((doc_id, run[0], run[-1] + _SPAN_K - 1, run[-1] - run[0] + _SPAN_K))
                    run = []
                run.append(i)
            elif sh is None and run:
                spans.add((doc_id, run[0], run[-1] + _SPAN_K - 1, run[-1] - run[0] + _SPAN_K))
    return docs, dup, cov, spans


def test_q173_matches_pure_python_recount(spark):
    docs, dup, cov, expect = _expected_spans(spark)
    rows = q173_duplicate_span_extraction(spark, SF).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in rows}
    assert len(got) == len(rows)  # no duplicate span rows
    assert got == expect
    assert 0 < len({d for d, *_ in got}) < len(docs)  # some docs clean, some not


def test_q173_spans_are_maximal_and_disjoint(spark):
    docs, dup, cov, _ = _expected_spans(spark)
    by_doc = defaultdict(list)
    for r in q173_duplicate_span_extraction(spark, SF).collect():
        assert r.span_tokens == r.span_end - r.span_start + 1 >= _SPAN_K
        assert 1 <= r.span_start and r.span_end <= len(docs[r.doc_id])
        by_doc[r.doc_id].append((r.span_start, r.span_end))
    for doc_id, spans in by_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1  # disjoint AND non-adjacent (else merged)
        for s, e in spans:
            # every token in the span is covered by a duplicated shingle;
            # the tokens just outside are not (maximality)
            assert all(i in cov[doc_id] for i in range(s, e + 1))
            assert s - 1 not in cov[doc_id]
            assert e + 1 not in cov[doc_id]


# ---- q174 HyperLogLog URL cardinality ------------------------------------

from webscraping_video_pipeline_spark.contract.monitor import (  # noqa: E402
    _HLL_ALPHA,
    _HLL_M,
    _HLL_MOD,
    _HLL_W,
    q174_hll_url_cardinality,
)


def _hll_recount(elems_by_group):
    """Pure-Python HLL per the q174 spec: md5 bucket + leading-zero rank,
    exact dyadic harmonic sum, raw estimate, linear-counting arm."""
    out = {}
    for g, elems in elems_by_group.items():
        regs = [0] * _HLL_M
        for el in set(elems):
            h = hashlib.md5(el.encode()).hexdigest()
            b = int(h[:8], 16) % _HLL_M
            v = int(h[8:13], 16)
            rho = _HLL_W + 1 if v == 0 else _HLL_W + 1 - v.bit_length()
            regs[b] = max(regs[b], rho)
        s = sum(2.0 ** -r for r in regs)  # dyadic -> exact in float
        zeros = regs.count(0)
        raw = _HLL_ALPHA * _HLL_M * _HLL_M / s
        est = _HLL_M * math.log(_HLL_M / zeros) if raw <= 2.5 * _HLL_M and zeros else raw
        out[g] = (len(elems), len(set(elems)), zeros, s, raw, est)
    return out


def test_q174_matches_pure_python_recount(spark):
    elems = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        elems[r.lang].append(f"u:{r.doc_id % _HLL_MOD}")
    expect = _hll_recount(elems)
    rows = {r.lang: r for r in q174_hll_url_cardinality(spark, SF).collect()}
    assert set(rows) == set(expect)
    for g, (n, ex, zeros, s, raw, est) in expect.items():
        r = rows[g]
        assert (r.n_rows, r.exact_distinct, r.n_zero_registers) == (n, ex, zeros)
        assert r.harmonic_sum == s  # dyadic sums are exact, order-free
        assert r.raw_estimate == raw
        assert r.estimate == pytest.approx(est, rel=1e-12)  # ln() may differ 1 ulp
        assert r.err_permille == math.floor(1000.0 * abs(est - ex) / ex)
        # m=16 -> sigma = 1.04/4 = 26%; 4-sigma envelope as a sanity band
        assert abs(r.estimate - ex) / ex < 1.04


def test_q174_linear_counting_arm(spark, tmp_path):
    # 5 distinct URLs -> most registers zero -> raw <= 2.5m fires the
    # linear-counting correction the sf fixtures never reach
    rows = [(i, "w " * 3, "xx", "s0", 6) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    (r,) = q174_hll_url_cardinality(spark, str(tmp_path)).collect()
    expect = _hll_recount({"xx": [f"u:{i}" for i in range(5)]})["xx"]
    assert r.raw_estimate <= 2.5 * _HLL_M and r.n_zero_registers > 0
    assert r.estimate == pytest.approx(_HLL_M * math.log(_HLL_M / r.n_zero_registers), rel=1e-12)
    assert r.estimate != r.raw_estimate  # the arm actually changed the answer
    assert (r.n_rows, r.exact_distinct) == (5, 5)
    assert r.estimate == pytest.approx(expect[5], rel=1e-12)


# ---- q175 margin-based bitext mining --------------------------------------

from webscraping_video_pipeline_spark.contract.similarity import (  # noqa: E402
    _BT_THETA,
    q175_bitext_mining,
)


def test_q175_mutual_nn_margin_recount(spark):
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    nrm = {i: _fold(x * x for x in v) for i, v in vecs.items()}
    src = sorted(i for i, lg in docs.items() if lg != "en")
    en = sorted(i for i, lg in docs.items() if lg == "en")

    def cos(a, b):
        return _fold(x * y for x, y in zip(vecs[a], vecs[b])) / math.sqrt(
            nrm[a] * nrm[b]
        )

    cm = {(s, e): cos(s, e) for s in src for e in en}
    fwd = {
        s: sorted(en, key=lambda e: (-cm[(s, e)], e))[:2] for s in src
    }
    bwd = {
        e: sorted(src, key=lambda s: (-cm[(s, e)], s))[:2] for e in en
    }
    expect = {}
    for s, (e1, e2) in fwd.items():
        if bwd[e1][0] != s:
            continue
        mf = cm[(s, e1)] / cm[(s, e2)]
        mb = cm[(s, e1)] / cm[(bwd[e1][1], e1)]
        m = min(mf, mb)
        expect[(s, e1)] = (docs[s], cm[(s, e1)], mf, mb, m, m >= _BT_THETA)

    rows = q175_bitext_mining(spark, SF).collect()
    got = {
        (r.src_id, r.en_id): (
            r.src_lang, r.cosine, r.margin_fwd, r.margin_bwd, r.margin, r.accepted
        )
        for r in rows
    }
    assert len(got) == len(rows)
    assert got == expect  # bit-exact: cosines/margins from identical folds
    n_acc = sum(v[5] for v in got.values())
    assert 0 < n_acc < len(got)  # theta splits the fixture both ways
    # mutual NN is a partial matching: each doc appears on at most one pair
    assert len({s for s, _ in got}) == len(got)
    assert len({e for _, e in got}) == len(got)


def test_q175_plan_is_two_broadcast_passes(spark):
    plan = q175_bitext_mining(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin") == 2  # one packed pass per direction
    assert "Window" not in plan  # top-2 is an in-projection array_sort slice
    assert "SortAggregate" not in plan



# ---- q177 HDR-histogram latency quantile sketch ----------------------------

from webscraping_video_pipeline_spark.contract.monitor import (  # noqa: E402
    _HDR_PCTS,
    _HDR_S,
    q177_hdr_latency_sketch,
)


def _hdr_idx(v):
    e = v.bit_length() - 1
    if e < _HDR_S:
        return v
    return (e - _HDR_S + 1) * (1 << _HDR_S) + ((v >> (e - _HDR_S)) - (1 << _HDR_S))


def _hdr_lo(idx):
    m = 1 << _HDR_S
    if idx < m:
        return idx
    return (m + idx % m) << (idx // m - 1)


def test_q177_matches_recount_and_error_bound(spark):
    vals = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        vals[r.event_type].append(max(math.floor(r.value * 1000) + 1, 1))
    rows = {r.event_type: r for r in q177_hdr_latency_sketch(spark, SF).collect()}
    assert set(rows) == set(vals)
    for et, vs in vals.items():
        r = rows[et]
        buckets = defaultdict(int)
        for v in vs:
            buckets[_hdr_idx(v)] += 1
        assert (r.n, r.n_buckets) == (len(vs), len(buckets))
        svs = sorted(vs)
        cum, walk = 0, []
        for idx in sorted(buckets):
            cum += buckets[idx]
            walk.append((idx, cum))
        for p in _HDR_PCTS:
            k = (p * len(vs) + 999) // 1000
            est = next(_hdr_lo(idx) for idx, c in walk if c >= k)
            got = getattr(r, f"p{p}_micro")
            assert got == est
            exact = svs[k - 1]  # true k-th order statistic
            # HDR guarantee: the estimate is the lower bound of the bucket
            # holding the k-th value -> one-sided relative error <= 2^-s
            assert got <= exact
            assert (exact - got) / exact <= 2.0 ** -_HDR_S
    # sketch counts are additive (mergeable): splitting any group's values
    # arbitrarily and summing per-bucket counts reproduces the whole
    some = next(iter(vals.values()))
    half = len(some) // 2
    merged = defaultdict(int)
    for part in (some[:half], some[half:]):
        for v in part:
            merged[_hdr_idx(v)] += 1
    whole = defaultdict(int)
    for v in some:
        whole[_hdr_idx(v)] += 1
    assert merged == whole


# ---- q178 duplicate-cluster size histogram ---------------------------------

from webscraping_video_pipeline_spark.contract.text import (  # noqa: E402
    q50_lsh_dedup_pipeline,
    q178_dup_cluster_histogram,
)


def test_q178_consistent_with_q50_and_token_accounting(spark):
    cc = {r.doc_id: r for r in q50_lsh_dedup_pipeline(spark, SF).collect()}
    toks = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    per = defaultdict(lambda: [0, 0, 0])  # cluster_id -> [size, tokens, kept]
    for doc_id, r in cc.items():
        per[r.cluster_id][0] += 1
        per[r.cluster_id][1] += toks[doc_id]
        if r.is_keeper:
            per[r.cluster_id][2] += toks[doc_id]
    expect = defaultdict(lambda: [0, 0, 0, 0])
    for sz, tks, kept in per.values():
        e = expect[sz]
        e[0] += 1
        e[1] += sz
        e[2] += tks
        e[3] += tks - kept
    rows = {r.cluster_size: r for r in q178_dup_cluster_histogram(spark, SF).collect()}
    assert set(rows) == set(expect)
    for sz, (nc, nd, nt, rem) in expect.items():
        r = rows[sz]
        assert (r.n_clusters, r.n_docs, r.n_dup_docs, r.n_tokens, r.n_removed_tokens) == (
            nc, nd, nd - nc, nt, rem
        )
    # accounting identities: histogram covers every doc and every token
    # exactly once; removed tokens never include a keeper's
    assert sum(r.n_docs for r in rows.values()) == len(cc)
    assert sum(r.n_tokens for r in rows.values()) == sum(toks.values())
    assert rows[1].n_dup_docs == 0 and rows[1].n_removed_tokens == 0
    assert any(sz > 1 for sz in rows)  # the fixture plants real near-dups
