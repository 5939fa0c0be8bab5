#!/usr/bin/env python
"""Attribute partition-less WindowExec nodes to registry queries.

A `Window` with an empty partitionSpec moves every row to ONE task —
the exact pinch round 5 removed from q13/q132/q144/q146. This tool
walks every registry query's physical plan (plan-only, nothing runs)
and lists the queries that still contain one, so each can be judged:
corpus-sized frame (a scale bug) vs bounded frame (top-k over an
aggregated handful of rows, fine and documented in SCALE.md).

Usage: python tools/window_audit.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _has_limit(node) -> bool:
    """True if the subtree contains a Global/Local limit or top-k sort —
    Catalyst's LimitPushDownThroughWindow / InferWindowGroupLimit put one
    UNDER a rank-filter window, bounding its input to partitions x k."""
    cls = node.getClass().getSimpleName()
    if cls in (
        "GlobalLimitExec",
        "LocalLimitExec",
        "TakeOrderedAndProjectExec",
        "WindowGroupLimitExec",
    ):
        return True
    for i in range(node.children().length()):
        if _has_limit(node.children().apply(i)):
            return True
    if cls == "AdaptiveSparkPlanExec":
        return _has_limit(node.initialPlan())
    return False


def global_windows(df) -> list[str]:
    """Window/WindowGroupLimit nodes with an empty partitionSpec; each
    tagged LIMIT-BOUNDED when a limit node below caps its input."""
    hits: list[str] = []

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                tag = "LIMIT-BOUNDED" if _has_limit(node.children().apply(0)) else "UNBOUNDED"
                hits.append(f"{cls}\t{tag}")
        for i in range(node.children().length()):
            walk(node.children().apply(i))
        # AQE wraps stages; descend into them too
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())

    walk(df._jdf.queryExecution().executedPlan())
    return hits


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from webscraping_video_pipeline_spark.contract import QUERIES
    from webscraping_video_pipeline_spark.session import get_spark

    spark = get_spark(app_name="window_audit", cpus=4)
    flagged = 0
    for name, fn in QUERIES.items():
        try:
            hits = global_windows(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{exc}")
            flagged += 1
            continue
        if hits:
            flagged += 1
            for h in hits:
                print(f"{name}\t{h}")
    print(f"# {flagged} of {len(QUERIES)} queries contain a global window")


if __name__ == "__main__":
    main()
