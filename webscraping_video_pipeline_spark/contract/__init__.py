"""Driver-contract query registry (SURVEY.md §2 inventory → testdata queries).

Each operator from the SURVEY §2 inventory gets a named query: a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) an
equivalent ANSI-SQL oracle string run by DuckDB on the same parquet tables.

Cross-engine determinism rules (so the driver's value-hash matches):

- additive double aggregates go through ``decimal(38,10)`` — exact,
  order-independent — then cast back to double (identical bits both engines);
- integer aggregates are cast to BIGINT explicitly (DuckDB sums to HUGEINT);
- no raw timestamps in outputs — format to strings or cast to date;
- every ranking has a total tiebreak; every output has stable column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    """Register a contract query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


from . import relational  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import crawl_ops  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import index  # noqa: E402,F401
from . import ingest  # noqa: E402,F401
from . import monitor  # noqa: E402,F401
from . import resolve  # noqa: E402,F401
from . import lm  # noqa: E402,F401

# The driver records CORRECTNESS rows for the FIRST 50 registry entries
# only, so ordering is the certification schedule. Round-4 front group
# (sessions 1-8): the 28 VERDICT-task queries q73-q100 (production
# SimHash, trained quantizers, graph/index/ingest ops), the 4 whose
# plan/code changed this round (cap_buckets rework -> q25/q50/q53;
# q62's broadcast-hint removal), and the 18 newest operators
# q116-q133 — exactly 50. The 15 session-5/6 queries q101-q115 sit
# OUTSIDE the window: their evidence is local — `python
# tools/compare_oracle.py /root/testdata/sf0.01 q101... q115...` green
# this session plus pure-Python recount pins in
# tests/test_session{5,6}* and the plan audit rows in BENCH/PLANS.md;
# rotate them in next round. The session-8 late additions q134-q150
# also sit outside (the window was already spoken for): their evidence
# is compare_oracle green on add + the pure-Python replay pins in
# tests/test_session8_ops.py + BENCH/PLANS.md audit rows. Every query
# outside the window was verified locally: the final round-4
# full-registry sweep ('152 pass, 0 fail, 0 rows-only', recorded in
# BENCH/BASELINE.md) covered the complete registry including the
# late additions q151-q153.
DRIVER_PRIORITY = [
    # plan/code changed in round 4 -> prior certification stale
    "q25_minhash_lsh_buckets",
    "q50_lsh_dedup_pipeline",
    "q53_simhash_neighbor_pairs",
    "q62_semantic_dedup",
    # round-4 session 8: OPIC, block-max index, front coding, WARC
    # revisit dedup, spam features, IP quotas, trained langid, RFC 9309
    # robots, reciprocity, ROLLUP budgets, calibration, assortativity
    "q122_opic_importance",
    "q123_blockmax_postings",
    "q124_frontcoded_url_index",
    "q125_warc_revisit_dedup",
    "q126_content_spam_features",
    "q127_ip_colocation_quota",
    "q128_trigram_langid_train",
    "q129_robots_longest_match",
    "q130_reciprocal_link_spam",
    "q131_crawl_budget_rollup",
    "q132_quality_calibration_curve",
    "q133_degree_assortativity",
    # round-4 session 7
    "q116_bpe_pair_counts",
    "q117_hits_hub_authority",
    "q118_discovery_saturation",
    "q119_unigram_surprisal_filter",
    "q120_repeated_substring_spans",
    "q121_kcore_linkfarm",
    # round-4 sessions 1-5: the VERDICT-task block
    "q73_simhash64_neardup",
    "q74_kmeans_ivf_assign",
    "q75_ann_ivf_trained_topk",
    "q76_scene_cut_detection",
    "q77_ann_pq_adc_rerank",
    "q78_classifier_quality_gate",
    "q79_ann_ivfpq_residual",
    "q80_linkgraph_pagerank",
    "q81_crawl_trap_detector",
    "q82_revisit_scheduler",
    "q83_inverted_index",
    "q84_anchor_text_index",
    "q85_authority_frontier",
    "q86_snapshot_diff",
    "q87_bm25_topk",
    "q88_mirror_host_pairs",
    "q89_shingle_containment",
    "q90_sitemap_discovery",
    "q91_cdx_offset_index",
    "q92_registrable_domain_rollup",
    "q93_incremental_index_update",
    "q94_aimd_rate_control",
    "q95_mirror_cluster_canonical",
    "q96_anf_reach_sketch",
    "q97_dust_param_rules",
    "q98_trustrank",
    "q99_harmonic_centrality",
    "q100_rendezvous_shards",
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry reordered so the driver's capped window certifies the
    queries that need fresh evidence (DRIVER_PRIORITY first, then the
    original registration order)."""
    front = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    return {n: QUERIES[n] for n in front + rest}


def ordered_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
