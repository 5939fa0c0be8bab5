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
"""

from __future__ import annotations

import math
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, "/root/repo")

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
    # exactly one shuffle: packing the bench rows (bench-sized); the corpus
    # side is scan -> join -> project with no exchange and no aggregate
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
