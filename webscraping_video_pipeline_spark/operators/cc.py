"""Connected components via alternating large-star / small-star
(Kiveris et al. 2014, "Connected Components in MapReduce and Beyond" —
public literature).

Why this NEXT TO the pointer-doubling label propagation in
contract/text.py (q50): pointer doubling iterates a LABEL TABLE and
shines once the edge set has been filtered down (near-dup clusters);
large/small-star rewrites the EDGE LIST itself — it never materializes
per-node adjacency or a label table, keeps the live edge count bounded
by the input size, and converges in O(log n) alternations on ANY graph
shape, including one web-scale component covering most nodes. That is
the algorithm of record for host-graph / link-graph components at
10^10 edges.

Each half-round is ONE groupBy-min plus ONE join co-keyed on the same
column of skinny 2-string rows (map-side combined, whole-stage
codegen); every round is checkpoint-staged so the plan stays flat (the
q80 idiom). The fixpoint check is a count + anti-join; a production
loop replaces it with an accumulator on the emit side (zero extra
jobs), noted inline.

Reference semantic: the reference has no graph ops at all (its sources
are disjoint by config, config.py:15-72); components are what an open
crawl needs for mirror collapse (contract/ingest.py q95) and dedup
clusters (q50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(df: DataFrame) -> DataFrame:
    return df.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct()


def star_contract(edges: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Contract an undirected edge list (columns ``a``, ``b``; any
    orderable type) to a star forest: returns the converged edge set in
    which every surviving edge is (component-root, member). Nodes not
    present in ``edges`` are untouched (singletons; re-attach with a
    left join, see :func:`components`)."""
    cur = _canon(edges)
    for _ in range(max_rounds):  # converges in O(log |V|) alternations
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # large-star: every neighbor v > u links to min(N(u) ∪ {u})
        lmin = sym.groupBy("a").agg(F.min("b").alias("mv"))
        lmin = lmin.select("a", F.least("mv", "a").alias("m"))
        large = (
            sym.join(lmin, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # small-star: orient high->low, link every low neighbor (and
        # the high node itself) to the minimum low neighbor
        o = large.select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        ).filter(F.col("hi") != F.col("lo"))
        smin = o.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            o.join(smin, "hi")
            .select(F.col("lo").alias("a"), F.col("m").alias("b"))
            .unionByName(
                smin.select(F.col("hi").alias("a"), F.col("m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        nxt = _canon(small).localCheckpoint()
        # fixpoint: same edge set as last round (count + anti-join; a
        # production loop counts emitted-changed edges in an accumulator
        # inside the round instead of running two extra jobs)
        if (
            nxt.count() == cur.count()
            and nxt.join(cur, ["a", "b"], "left_anti").isEmpty()
        ):
            return nxt
        cur = nxt
    return cur


def components(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Label every row of ``nodes`` (single column ``host`` — or rename
    before calling) with its component's minimum member. ``edges`` has
    columns (a, b). Returns (host, cluster)."""
    stars = star_contract(edges)
    sym = stars.unionByName(
        stars.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    lbl = sym.groupBy("a").agg(F.min("b").alias("mn"))
    key = nodes.columns[0]
    return nodes.join(lbl, nodes[key] == lbl["a"], "left").select(
        key, F.least(F.coalesce("mn", key), key).alias("cluster")
    )
