"""Round-5 session-13 pins for q179 local triangle counting + clustering
coefficient:

- every (deg, n_triangles, lcc_permille) row matches a brute-force
  pure-Python recount (adjacency sets over the same md5-derived link
  graph, triangles per node counted exhaustively), so the degree-
  orientation algorithm is pinned against the naive definition it
  replaces;
- the fixture graph actually contains triangles (a zero-triangle corpus
  would pin nothing), both lcc verdict classes appear, and the global
  triangle identity holds: sum over nodes of n_triangles = 3 * |T|;
- the orientation invariant that makes the plan skew-proof: the maximum
  wedge fan-out (orientation out-degree) across all nodes is bounded by
  sqrt(2m)+1 — the mega-hub generates no wedges.
"""

from __future__ import annotations

import hashlib
import sys
from itertools import combinations

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
_FANOUT = 3


def _doc_ids(spark):
    return [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]


def _und_graph(doc_ids):
    """The same deterministic link graph as contract/graph.py's
    _link_graph (md5(doc_id:j) mod N, self-loops dropped), symmetrized."""
    n = len(doc_ids)
    adj = {d: set() for d in doc_ids}
    for d in doc_ids:
        for j in range(1, _FANOUT + 1):
            h = hashlib.md5(f"{d}:{j}".encode()).hexdigest()
            dst = int(h[:8], 16) % n
            if dst != d:
                adj[d].add(dst)
                adj[dst].add(d)
    return adj


def test_q179_matches_bruteforce_recount(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q179_triangle_clustering,
    )

    doc_ids = _doc_ids(spark)
    adj = _und_graph(doc_ids)
    tri = {d: 0 for d in doc_ids}
    for d in doc_ids:
        for x, y in combinations(sorted(adj[d]), 2):
            if y in adj[x]:
                tri[d] += 1
    got = {
        r.doc_id: (r.deg, r.n_triangles, r.lcc_permille)
        for r in q179_triangle_clustering(spark, SF).collect()
    }
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        deg = len(adj[d])
        lcc = (2000 * tri[d]) // (deg * (deg - 1)) if deg >= 2 else 0
        assert got[d] == (deg, tri[d], lcc), f"doc {d}"


def test_q179_fixture_is_discriminating_and_identity_holds(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q179_triangle_clustering,
    )

    rows = q179_triangle_clustering(spark, SF).collect()
    total = sum(r.n_triangles for r in rows)
    assert total > 0 and total % 3 == 0, "per-node counts must be 3x |T|"
    assert any(r.lcc_permille > 0 for r in rows)
    assert any(r.lcc_permille == 0 and r.deg >= 2 for r in rows)


def test_q179_orientation_bounds_wedge_fanout(spark):
    doc_ids = _doc_ids(spark)
    adj = _und_graph(doc_ids)
    m = sum(len(s) for s in adj.values()) // 2
    order = {d: (len(adj[d]), d) for d in doc_ids}
    max_out = max(
        sum(1 for x in adj[d] if order[x] > order[d]) for d in doc_ids
    )
    assert max_out * (max_out - 1) <= 2 * m, (
        "orientation out-degree exceeded the sqrt(2m) skew bound"
    )


def test_q180_matches_bruteforce_recount(spark):
    import math

    from webscraping_video_pipeline_spark.contract.graph import (
        _AA_MAX_DEG,
        q180_adamic_adar_links,
    )

    doc_ids = _doc_ids(spark)
    adj = _und_graph(doc_ids)
    want = {}
    for w in doc_ids:
        deg = len(adj[w])
        if not (2 <= deg <= _AA_MAX_DEG):
            continue
        w_micro = math.floor(1000000.0 / math.log(float(deg)))
        for x, y in combinations(sorted(adj[w]), 2):
            if y not in adj[x]:  # predictions only — never existing edges
                c, s = want.get((x, y), (0, 0))
                want[(x, y)] = (c + 1, s + w_micro)
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.aa_micro)
        for r in q180_adamic_adar_links(spark, SF).collect()
    }
    assert got == want


def test_q180_cap_binds_and_pairs_are_novel_canonical(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        _AA_MAX_DEG,
        q180_adamic_adar_links,
    )

    doc_ids = _doc_ids(spark)
    adj = _und_graph(doc_ids)
    # the hub prune must BIND on this fixture, else the cap is untested
    assert any(len(adj[d]) > _AA_MAX_DEG for d in doc_ids)
    rows = q180_adamic_adar_links(spark, SF).collect()
    assert rows, "fixture produced no predictions"
    for r in rows:
        assert r.doc_a < r.doc_b, "pairs must be canonical (a < b)"
        assert r.doc_b not in adj[r.doc_a], "predicted an existing edge"
        assert r.n_common >= 1 and r.aa_micro > 0
