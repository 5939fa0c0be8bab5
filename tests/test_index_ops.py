"""Behavioral pins for the index-build operators (contract/index.py)
beyond the driver's value-hash oracle: champion-list invariants and
token accounting for q83, anchor accounting against an independent
link-occurrence recount for q84.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.index import (  # noqa: E402
    q83_inverted_index,
    q84_anchor_text_index,
)

SF = "/root/testdata/sf0.001"


def test_inverted_index_champion_invariants(spark):
    rows = q83_inverted_index(spark, SF).collect()
    assert rows
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    for term, champs in by_term.items():
        assert 1 <= len(champs) <= 3
        champs.sort(key=lambda r: r["rk"])
        # rank is dense from 1 and ordered by (tf desc, doc_id asc)
        assert [c["rk"] for c in champs] == list(range(1, len(champs) + 1))
        for a, b in zip(champs, champs[1:]):
            assert (a["tf"], -a["doc_id"]) >= (b["tf"], -b["doc_id"])
        df, cf = champs[0]["df"], champs[0]["cf"]
        assert all(c["df"] == df and c["cf"] == cf for c in champs)
        assert df >= len(champs) and cf >= df
        assert all(c["first_pos"] >= 1 and c["tf"] >= 1 for c in champs)


def test_inverted_index_cf_accounts_for_every_token(spark):
    """Sum of per-term collection frequencies must equal the corpus token
    count — the index lost or duplicated nothing."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.lower("text"), " "))).alias("n")
    ).collect()[0]["n"]
    per_term = {
        r["term"]: r["cf"] for r in q83_inverted_index(spark, SF).collect()
    }
    assert sum(per_term.values()) == n_tokens


def test_anchor_index_matches_independent_link_recount(spark):
    got = {r["doc_id"]: r for r in q84_anchor_text_index(spark, SF).collect()}
    assert got
    # independent recount of non-self link occurrences per target
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    n = d.count()
    lk = (
        d.select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % n
            ).alias("dst"),
        )
        .filter(F.col("dst") != F.col("src"))
    )
    want = {r["dst"]: r["c"] for r in lk.groupBy("dst").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert {k: r["n_inlinks"] for k, r in got.items()} == want
    for r in got.values():
        assert 1 <= r["n_distinct_anchors"] <= r["n_inlinks"]
        assert 1 <= r["top_anchor_n"] <= r["n_inlinks"]
        assert len(r["top_anchor"].split(" ")) == 2
