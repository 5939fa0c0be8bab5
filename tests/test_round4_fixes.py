"""Round-4 pins:

- the reworked oversize-bucket guard (census + broadcast anti-join) cuts
  q25's shuffle count back down — the r3 window form cost 6 exchanges;
- the Lloyd k-means trainer (operators/kmeans.py) is partition-order
  independent, monotonically non-increasing in SSE, and drops empty
  cells deterministically;
- q73's 64-bit SimHash finds a planted near-duplicate pair and stays
  bounded on an adversarial constant-content flood (bucket cap).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.text import (  # noqa: E402
    q25_minhash_lsh_buckets,
    q73_simhash64_neardup,
)
from webscraping_video_pipeline_spark.operators.kmeans import (  # noqa: E402
    assign_cells,
    lloyd_train,
    seed_centroids,
    sqdist_dec,
    update_centroids,
)

SF = "/root/testdata/sf0.001"


def _n_shuffles(df) -> int:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    return final.count("Exchange hashpartitioning")


def test_q25_bucket_guard_adds_no_fullrow_shuffle(spark):
    # census+broadcast-anti-join guard: the only hash exchanges left are
    # the (band, sig) self-join side(s) and the skinny census agg + the
    # final pair groupBy — the guarded SIGNATURE frame itself is never
    # exchanged. r3's window form measured 6.
    assert _n_shuffles(q25_minhash_lsh_buckets(spark, SF)) <= 4


def _vecs(spark, sf_dir=SF):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )


def test_kmeans_partition_order_independent(spark):
    e = _vecs(spark)
    out = {}
    for parts, key in [(1, "a"), (13, "b")]:
        cents = lloyd_train(e.repartition(parts), k=4, iters=2)
        a = assign_cells(e, cents)
        out[key] = sorted((r.vec_id, r.cell, str(r.d2)) for r in a.collect())
    assert out["a"] == out["b"]


def test_kmeans_sse_non_increasing(spark):
    e = _vecs(spark)

    def sse(cents):
        a = assign_cells(e, cents)
        return float(a.agg(F.sum(F.col("d2").cast("double"))).collect()[0][0])

    c0 = seed_centroids(e, 4)
    a1 = assign_cells(e, c0)
    c1 = update_centroids(a1, e)
    a2 = assign_cells(e, c1)
    c2 = update_centroids(a2, e)
    s0, s1, s2 = sse(c0), sse(c1), sse(c2)
    assert s1 <= s0 + 1e-9 and s2 <= s1 + 1e-9, (s0, s1, s2)


def test_update_centroids_fixed_width_equals_posexplode(spark):
    """The dim-known single-aggregate centroid update (one shuffle, dim
    decimal buffers) must be BIT-identical to the posexplode fallback —
    same decimal sums, same single division — on real data."""
    e = _vecs(spark)
    a = assign_cells(e, seed_centroids(e, 4))
    fast = {r["cell"]: r["c"] for r in update_centroids(a, e, dim=64).collect()}
    slow = {r["cell"]: r["c"] for r in update_centroids(a, e).collect()}
    assert fast == slow


def test_kmeans_empty_cell_drops(spark):
    # duplicate seed vectors: vecs 0 and 1 are identical, so both assign
    # to cell 0 (exact-decimal tie -> lowest cell) and cell 1 receives no
    # members -> the centroid table shrinks deterministically
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])] + [
        (10 + i, [100.0 + i * 0.001, 0.0]) for i in range(5)
    ]
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = lloyd_train(e, k=3, iters=1)
    n = cents.count()
    assert n < 3
    # every vector still gets a cell from the surviving centroids
    assert assign_cells(e, cents).count() == len(rows)


def test_sqdist_exact_zero_on_identical(spark):
    e = spark.createDataFrame(
        [(1, [0.25, -0.5, 0.125])], "vec_id long, v array<double>"
    )
    d = e.select(sqdist_dec(F.col("v"), F.col("v")).alias("d")).collect()[0].d
    assert float(d) == 0.0


def _docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_q62_literal_assignment_equals_join_path(spark):
    # q62 embeds the trained centroids as literal arrays (driver-sized k
    # tactic); assign_cells_dot is the centroid-TABLE join path for large
    # k. Same centroids -> bit-identical (vec_id, cell) assignment.
    from webscraping_video_pipeline_spark.contract.similarity import (
        q62_semantic_dedup,
    )
    from webscraping_video_pipeline_spark.operators.kmeans import assign_cells_dot

    lit_cells = {
        (r.vec_id, r.cell) for r in q62_semantic_dedup(spark, SF).collect()
    }
    e = _vecs(spark)
    cents = lloyd_train(e, k=8, iters=2)
    join_cells = {(r.vec_id, r.cell) for r in assign_cells_dot(e, cents).collect()}
    assert lit_cells == join_cells


def test_bucket_cap_preserves_neardup_recall(spark, tmp_path):
    # VERDICT r3 #5: prove on a realistic fixture (not the adversarial
    # flood) that MINHASH_BUCKET_CAP loses no pair with true Jaccard >=
    # 0.7 — plant near-dup families INSIDE large-but-legit buckets. Each
    # family shares a long common core (so family members collide in many
    # bands) and the bucket is padded close to (but under) the cap with
    # docs that share ONE band-colliding prefix shingle set yet are
    # otherwise unique.
    from webscraping_video_pipeline_spark.contract.text import (
        q25_minhash_lsh_buckets,
    )
    from webscraping_video_pipeline_spark.operators.lsh import MINHASH_BUCKET_CAP

    core = " ".join(f"core{i}" for i in range(120))
    rows = []
    # 3 planted families of 4 true near-dups each (Jaccard >= 0.7 by
    # construction: 120 shared tokens, <= 6 private)
    fam_pairs = set()
    for f in range(3):
        ids = []
        for m in range(4):
            did = 1000 * (f + 1) + m
            ids.append(did)
            rows.append((did, core + f" fam{f} " + " ".join(f"p{f}_{m}_{j}" for j in range(m))))
        fam_pairs |= {(a, b) for a in ids for b in ids if a < b}
    # bucket padding: many docs sharing the same leading window (collide
    # in SOME bands) but unique tails -> large, legitimate buckets just
    # UNDER the cap
    pad = " ".join(f"pad{i}" for i in range(40))
    for i in range(MINHASH_BUCKET_CAP - 10):
        rows.append((5000 + i, pad + " " + " ".join(f"u{i}_{j}" for j in range(60))))
    # plus a degenerate flood that DOES trip the cap (exact-dup content the
    # q20/q28 stage owns) — its oversize buckets must drop without taking
    # the families' legit buckets with them
    for i in range(3 * MINHASH_BUCKET_CAP):
        rows.append((9000 + i, "flood flood flood identical boilerplate shell page"))
    out = q25_minhash_lsh_buckets(spark, _docs(spark, tmp_path, rows))
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    missing = fam_pairs - got
    assert not missing, f"cap dropped true near-dup pairs: {sorted(missing)}"


def test_q73_finds_planted_neardup(spark, tmp_path):
    base = " ".join(f"word{i}" for i in range(200))
    near = base.replace("word7 ", "word7x ")  # one token off -> tiny hamming
    rows = [(1, base), (2, near)] + [
        (10 + i, " ".join(f"tok{i}_{j}" for j in range(50))) for i in range(20)
    ]
    out = {r.doc_id: r for r in q73_simhash64_neardup(spark, _docs(spark, tmp_path, rows)).collect()}
    assert out[1].n_near >= 1 and out[2].n_near >= 1
    # identical signatures imply hamming 0 <= 3; unrelated docs stay 0
    assert all(out[10 + i].n_near == 0 for i in range(20))


def test_q73_flood_bounded_by_cap(spark, tmp_path):
    rows = [(i, "the same constant content every single time") for i in range(300)]
    out = q73_simhash64_neardup(spark, _docs(spark, tmp_path, rows))
    rs = out.collect()
    # 300 identical docs -> every band bucket oversize -> all dropped ->
    # zero candidates; per-doc signatures still emitted
    assert len(rs) == 300
    assert all(r.n_near == 0 for r in rs)


def test_q76_cut_fires_exactly_at_planted_frame(spark):
    """Scene-cut flag must fire at frame 2 + doc_id % 3 and NOWHERE else
    (ordinary inter-frame drift is +10 luma, the planted jump +130, the
    threshold 64) — and the decoded means must match the wrap-free
    closed form, proving the real BMP decode feeds the window."""
    from webscraping_video_pipeline_spark.contract.similarity import (
        q76_scene_cut_detection,
    )

    rows = q76_scene_cut_detection(spark, SF).collect()
    assert rows, "no frames produced"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frames in by_doc.items():
        assert len(frames) == 6
        cut_at = {r.frame_idx for r in frames if r.is_cut}
        assert cut_at == {2 + doc_id % 3}, f"doc {doc_id}: cuts at {cut_at}"
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        for r in frames:
            shift = 10 * r.frame_idx + (120 if r.frame_idx >= 2 + doc_id % 3 else 0)
            assert r.mean_luma == doc_id % 64 + shift + (h - 1) + (w - 1) / 2 + 1


def test_assign_cells_np_matches_exact_path(spark):
    """The numpy fast-path assignment (float64 matmul argmin) must agree
    with the exact-decimal path on real data (embeddings table, trained
    centroids) — disagreement is possible only at float-rounding ties,
    which this fixed dataset does not produce."""
    from pyspark.sql import functions as F

    from webscraping_video_pipeline_spark.operators.kmeans import (
        assign_cells,
        assign_cells_np,
        lloyd_train,
    )

    e = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
        )
    )
    cents = lloyd_train(e, k=8, iters=2).localCheckpoint()
    exact = {r.vec_id: r.cell for r in assign_cells(e, cents).collect()}
    fast = {r.vec_id: r.cell for r in assign_cells_np(e, cents).collect()}
    assert exact == fast
