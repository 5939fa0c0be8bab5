"""Bucketing evidence: the standing pages table, written with
``catalog.write_bucketed`` (SCALE.md §1 `bucket(N, url)` layout), joins
against a scheduled batch WITHOUT shuffling the big side — only the small
probe side gets an Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraping_video_pipeline_spark.catalog import write_bucketed


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_fetch_join_shuffles_only_probe_side(spark):
    pages = spark.range(20_000).select(
        F.concat(F.lit("https://h"), F.col("id") % 50, F.lit(".example.com/p/"), F.col("id")).alias("canon_url"),
        F.encode(F.concat(F.lit("<html>"), F.col("id")), "utf-8").alias("html"),
    )
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_test")
    write_bucketed(pages, "pages_bucketed_test", buckets=8)

    sched = spark.range(500).select(
        F.concat(F.lit("https://h"), F.col("id") % 50, F.lit(".example.com/p/"), F.col("id") * 7).alias("canon_url"),
        F.lit(0).alias("slot"),
    )
    bucketed = spark.table("pages_bucketed_test")
    # disable broadcast so the join strategy question is real (at 10^10
    # rows nothing broadcasts); SMJ/shuffled-hash must reuse the buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = sched.join(bucketed, "canon_url", "left")
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS pages_bucketed_test")

    # AQE's toString echoes the pre-adaptive plan under "== Initial Plan ==";
    # only the final executed section counts
    final = plan.split("== Initial Plan ==")[0]
    assert "Bucketed: true" in final, final[:2000]
    assert "SelectedBucketsCount: 8 out of 8" in final, final[:2000]
    # exactly ONE Exchange — the probe (scheduled) side; the bucketed scan
    # side must reach the join with no shuffle
    assert final.count("Exchange hashpartitioning") == 1, final[:2000]
