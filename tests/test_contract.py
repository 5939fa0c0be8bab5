"""Fast contract regression: a representative query subset compared against
the DuckDB oracle at sf0.001 (the full sweep is tools/compare_oracle.py at
sf0.01 — this keeps `pytest -x -q` minutes, not tens of minutes).
"""

from __future__ import annotations

import duckdb
import pytest

import sys

sys.path.insert(0, "/root/repo")

from tools.compare_oracle import table_digest  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "q01_pricing_summary",
    "q06_anti_join_inactive_customers",
    "q08_best_line_per_order",
    "q11_running_budget_per_customer",
    "q18_json_props",
    "q21_tumbling_hourly",
    "q25_minhash_lsh_buckets",
    "q27_simhash16",
    "q30_quality_score",
    "q32_ann_cosine_topk",
    "q36_politeness_slots",
    "q37_url_canonicalize",
    "q44_salted_skew_join",
    "q47_ann_ivf_topk",
    "q54_winnowing_fingerprints",
    "q55_multimodal_frame_sample",
    "q56_ann_quantized_rerank",
    "q57_boilerplate_chunk_dedup",
    "q58_gopher_quality_rules",
    "q60_ngram_decontamination",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for tname in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {tname} AS SELECT * FROM '{SF}/{tname}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.mark.parametrize("name", SUBSET)
def test_contract_query_matches_oracle(spark, oracle_con, contract, name):
    queries, oracles = contract
    sdf = queries[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    rel = oracle_con.sql(oracles[name])
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    sh, _ = table_digest(sdf.columns, srows)
    dh, _ = table_digest(rel.columns, drows)
    assert sh == dh, f"value hash mismatch for {name}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"host", "doc_id", "slot", "offset_s"}


def test_driver_priority_names_resolve_and_window_covers_fresh_code():
    """Every DRIVER_PRIORITY name must exist in the registry (a typo would
    silently fall out of the driver's 50-entry certification window), the
    front of ordered_queries() must be exactly DRIVER_PRIORITY, and every
    registered query must carry an oracle."""
    from webscraping_video_pipeline_spark.contract import (
        DRIVER_PRIORITY,
        ORACLES,
        QUERIES,
        ordered_oracles,
        ordered_queries,
    )

    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert missing == []
    ordered = list(ordered_queries())
    assert ordered[: len(DRIVER_PRIORITY)] == DRIVER_PRIORITY
    assert len(DRIVER_PRIORITY) <= 50, "priority set exceeds the driver window"
    assert set(ordered) == set(QUERIES)
    assert set(ordered_oracles()) == set(ORACLES)
    assert [n for n in QUERIES if n not in ORACLES] == []


def test_every_changed_query_is_in_driver_window():
    """Mechanical changed-set discipline (r4 VERDICT item 6): every query
    whose code changed since the `round4` tag — own body, referenced
    helper/constant, or module-level effect — must sit in the driver's
    50-entry certification window, or be explicitly justified in
    contract.WINDOW_WAIVED (the changed set outgrew the 50 slots in
    session 17; a waiver must never ALSO be windowed, must exist in the
    registry, and must carry its own pytest pin). Skips when the tag is
    absent (fresh clones of the public repo)."""
    import subprocess
    import sys

    import pytest

    tags = subprocess.run(
        ["git", "tag", "--list", "round4"],
        cwd="/root/repo",
        capture_output=True,
        text=True,
    ).stdout.split()
    if "round4" not in tags:
        pytest.skip("no round4 tag in this clone")
    sys.path.insert(0, "/root/repo/tools")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "changed_queries", "/root/repo/tools/changed_queries.py"
    )
    cq = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cq)
    from webscraping_video_pipeline_spark.contract import DRIVER_PRIORITY

    from webscraping_video_pipeline_spark.contract import QUERIES, WINDOW_WAIVED

    window = set(DRIVER_PRIORITY[: cq.WINDOW])
    waived = set(WINDOW_WAIVED)
    assert not (window & waived), "a WINDOW_WAIVED query is also windowed"
    assert all(q in QUERIES for q in waived), "WINDOW_WAIVED names a ghost"
    outside = [
        q for q in cq.changed_queries("round4") if q not in window and q not in waived
    ]
    assert outside == [], f"changed queries outside window+waivers: {outside}"
