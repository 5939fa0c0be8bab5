"""Round-3 plan/robustness pins:

- q65's fingerprint-dedup Exchange carries only skinny metric columns —
  the full token array (`ws`) never crosses the shuffle (r2 verdict #1);
- the LSH oversize-bucket guard (operators/lsh.py) bounds candidate
  generation on adversarial degenerate input (500 identical docs) and
  reports what it dropped via an Observation — never silently;
- q66 (xxhash64 chunk-key) is byte-equivalent to q64 (string chunk key);
- dedupe_against_seen picks a partition-order-independent survivor even
  WITHOUT a priority column (r2 verdict #2);
- the q67 BMP codec round-trips real padded bottom-up BGR images.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    q64_first_occurrence_chunk_dedup,
    q65_training_set_selection,
    q66_chunk_dedup_hashkey,
)
from webscraping_video_pipeline_spark.contract.similarity import (  # noqa: E402
    _decode_bmp,
    _synth_bmp,
)
from webscraping_video_pipeline_spark.contract.text import (  # noqa: E402
    q25_minhash_lsh_buckets,
    q50_lsh_dedup_pipeline,
)
from webscraping_video_pipeline_spark.operators.dedup import (  # noqa: E402
    dedupe_against_seen,
)
from webscraping_video_pipeline_spark.operators.lsh import cap_buckets  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_q65_fp_exchange_carries_no_token_arrays(spark):
    df = q65_training_set_selection(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    idx = final.find("Exchange hashpartitioning(fp#")
    assert idx > 0, final[:2000]
    # everything ABOVE the fp exchange (= its consumers) must be free of
    # the token array: metrics are reduced to scalars below the shuffle
    assert "ws#" not in final[:idx], final[:idx]
    # and the group-limit optimization still prunes per-fp rows map-side
    assert "WindowGroupLimit" in final


def _identical_docs(spark, tmp_path, n=500):
    sf_dir = str(tmp_path / "degenerate")
    text = "the quick brown fox jumps over the lazy dog again and again"
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("flood").alias("source"),
        F.lit(len(text)).cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_bucket_cap_bounds_adversarial_flood_q25(spark, tmp_path):
    sf_dir = _identical_docs(spark, tmp_path)
    # 500 identical docs -> one signature per band -> every bucket is
    # oversize -> dropped; without the cap this would be ~4*500^2/2 pairs
    assert q25_minhash_lsh_buckets(spark, sf_dir).count() == 0


def test_bucket_cap_bounds_adversarial_flood_q50(spark, tmp_path):
    sf_dir = _identical_docs(spark, tmp_path)
    rows = q50_lsh_dedup_pipeline(spark, sf_dir).collect()
    # no candidates -> no edges -> every doc is its own singleton cluster
    # (the exact-dup stage, q20/q28, owns constant-content removal)
    assert len(rows) == 500
    assert all(r.is_keeper and r.cluster_id == r.doc_id for r in rows)


def test_cap_buckets_observes_dropped_rows(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(2)],
        "k string, v long",
    )
    obs = Observation("cap_test")
    out = cap_buckets(df, ["k"], cap=3, observe_as=obs)
    rows = out.collect()
    assert sorted(r.k for r in rows) == ["b", "b"]
    got = obs.get
    assert got["rows_in_oversize_buckets"] == 10
    assert got["max_bucket_size"] == 10


def test_cap_buckets_passthrough_below_cap(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v long")
    assert cap_buckets(df, ["k"], cap=8).count() == 3


def test_q66_hashkey_equivalent_to_q64(spark):
    a = {r.doc_id: r for r in q64_first_occurrence_chunk_dedup(spark, SF).collect()}
    b = {r.doc_id: r for r in q66_chunk_dedup_hashkey(spark, SF).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert (a[k].n_chunks, a[k].n_dropped, a[k].cleaned_text) == (
            b[k].n_chunks,
            b[k].n_dropped,
            b[k].cleaned_text,
        ), k


def test_dedupe_survivor_deterministic_without_priority(spark):
    # same url_hash spelled 3 ways, no priority column: the survivor must
    # be the total-tiebreak minimum, regardless of partitioning order
    rows = [
        (1, "https://a.example.com/z", "zz"),
        (1, "https://a.example.com/b", "mm"),
        (1, "https://a.example.com/m", "aa"),
        (2, "https://b.example.com/x", "xx"),
    ]
    outs = []
    for parts, ordering in [(1, "url_hash"), (7, "extra"), (3, "canon_url")]:
        df = (
            spark.createDataFrame(rows, "url_hash long, canon_url string, extra string")
            .orderBy(F.col(ordering).desc())
            .repartition(parts)
        )
        got = {
            r.url_hash: (r.canon_url, r.extra)
            for r in dedupe_against_seen(df, None).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    # canon_url leads the tiebreak -> lowest canon_url wins for hash 1
    assert outs[0][1] == ("https://a.example.com/b", "mm")


def test_bmp_codec_roundtrip_padding_and_channels():
    # widths 4..8 exercise row padding 0..3; formula pins BGR->RGB mapping
    for doc_id in range(16):
        w, h, sr, sg, sb = _decode_bmp(_synth_bmp(doc_id))
        assert (w, h) == (4 + doc_id % 5, 3 + doc_id % 4)
        exp_r = exp_g = exp_b = 0
        for y in range(h):
            for x in range(w):
                base = doc_id * 7 + y * 13 + x * 5
                exp_r += base % 256
                exp_g += (base + 11) % 256
                exp_b += (base + 22) % 256
        assert (sr, sg, sb) == (exp_r, exp_g, exp_b), doc_id
