"""Behavioral pins for the link-graph / crawl-scheduling operators
(contract/graph.py) beyond the driver's value-hash oracle:

- q80 PageRank: mass conservation, damping floor, degree bounds;
- q81 trap detector: exactly the planted trap hosts flagged;
- q82 revisit scheduler: priority identity and the single-fetch edge
  case (rate 0, never due).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.graph import (  # noqa: E402
    q80_linkgraph_pagerank,
    q81_crawl_trap_detector,
    q82_revisit_scheduler,
    q85_authority_frontier,
)

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_conserved_and_bounded(spark):
    rows = q80_linkgraph_pagerank(spark, SF).collect()
    n = len(rows)
    assert n > 0
    total = sum(r["pr"] for r in rows)
    # damping + uniform dangling redistribution conserve rank mass up to
    # the decimal(27,12) contribution rounding (<= 1e-12 per edge)
    assert abs(total - 1.0) < 1e-6
    floor = 0.15 / n
    for r in rows:
        assert r["pr"] >= floor - 1e-12, "rank below the damping floor"
        assert 0 <= r["out_deg"] <= 3, "fanout is 3 minus self-loops/dups"


def test_pagerank_indegree_monotone_on_average(spark):
    """Authority must flow along in-links: pages in the top in-degree
    quartile average a strictly higher rank than the zero-in-degree set."""
    df = q80_linkgraph_pagerank(spark, SF)
    # recompute in-degree from the same deterministic edge derivation
    from webscraping_video_pipeline_spark.contract.graph import _link_graph

    edges, _, _ = _link_graph(spark, SF)
    ind = edges.groupBy(F.col("dst").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    j = df.join(ind, "doc_id", "left").fillna(0, subset=["in_deg"]).collect()
    zero = [r["pr"] for r in j if r["in_deg"] == 0]
    hot = sorted(j, key=lambda r: -r["in_deg"])[: max(1, len(j) // 4)]
    assert zero, "fixture should contain pages nobody links to"
    assert (sum(r["pr"] for r in hot) / len(hot)) > (sum(zero) / len(zero))


def test_trap_detector_flags_exactly_planted_hosts(spark):
    rows = q81_crawl_trap_detector(spark, SF).collect()
    flagged = {r["host"] for r in rows if r["is_trap"]}
    assert flagged == {"src0.example.com", "src1.example.com"}
    for r in rows:
        assert r["n_templates"] <= r["n_urls"]
        assert r["urls_per_template"] >= 1.0


def test_authority_frontier_slots_follow_pagerank(spark):
    """Per host: at most 4 slots, dense from 0, rank non-increasing down
    the slots (pr desc, doc_id tiebreak), offset = slot * crawl_delay."""
    rows = q85_authority_frontier(spark, SF).collect()
    assert rows
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, slots in by_host.items():
        slots.sort(key=lambda r: r["slot"])
        assert [s["slot"] for s in slots] == list(range(len(slots)))
        assert len(slots) <= 4
        for a, b in zip(slots, slots[1:]):
            assert (a["pr"], -a["doc_id"]) >= (b["pr"], -b["doc_id"])
        for s in slots:
            assert s["offset_s"] == s["slot"] * 2.0


def test_snapshot_diff_classification_closed_form(spark):
    """Every doc lands in exactly the class its membership/rewrite rules
    dictate: in-B-only -> added, in-A-only -> removed, both + rewritten
    -> changed, both + identical -> unchanged; %7∧%5 docs (in neither
    snapshot) never appear."""
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        q86_snapshot_diff,
    )

    got = {r["doc_id"]: r["status"] for r in q86_snapshot_diff(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    for d in range(n):
        in_a, in_b = d % 7 != 0, d % 5 != 0
        if not in_a and not in_b:
            assert d not in got
        elif not in_a:
            assert got[d] == "added"
        elif not in_b:
            assert got[d] == "removed"
        elif d % 3 == 0:
            assert got[d] == "changed"
        else:
            assert got[d] == "unchanged"
    assert len(got) == sum(1 for d in range(n) if d % 7 != 0 or d % 5 != 0)


def test_revisit_priority_identity_and_single_fetch_edge(spark):
    rows = q82_revisit_scheduler(spark, SF).collect()
    assert rows
    for r in rows:
        if r["n_fetches"] > 1:
            rate = r["n_changes"] / (r["n_fetches"] - 1)
        else:
            rate = 0.0
            assert r["n_changes"] == 0
            assert not r["due"], "a never-re-fetched URL has no change signal"
        want = rate * (r["staleness_s"] / 3600.0)
        assert abs(r["revisit_priority"] - want) < 1e-12
        assert r["due"] == (r["revisit_priority"] > 8.0)
