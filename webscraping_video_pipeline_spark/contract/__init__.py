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
# only, so ordering is the certification schedule. Round-4 front group:
# the 28 queries NEW this round (q73-q100), the 4 whose plan/code
# changed this round (cap_buckets rework -> q25/q50/q53; q62's
# broadcast-hint removal), then 18 of the 21 queries that fell outside
# r3's window (driver-certified in r1/r2 on byte-identical code,
# carrying the OLDEST driver rows). The three left out of that group
# (q33_ann_sign_lsh_buckets, q34_embedding_neardup_pairs,
# q46_multimodal_decode_stub — byte-unchanged since their r1/r2 driver
# rows) plus every query outside the window were re-verified locally
# this session via `python tools/compare_oracle.py` at sf0.01; see
# BENCH/BASELINE.md "standing evidence".
DRIVER_PRIORITY = [
    # new in round 4 (session 5): bounded-memory monitoring layer —
    # count-min heavy hitters, exact percentiles by distributed
    # selection, max-min fair budget water-filling
    "q101_cms_heavy_hitters",
    "q102_latency_percentiles",
    "q103_fair_budget_allocation",
    # new in round 4 (session 7): BPE merge-candidate counting over the
    # vocab table, HITS hubs/authorities, discovery-saturation curve
    "q116_bpe_pair_counts",
    "q117_hits_hub_authority",
    "q118_discovery_saturation",
    # new in round 4 (session 6): pointer-doubling redirect resolution,
    # positional phrase search, capped co-occurrence lift
    "q104_redirect_resolution",
    "q105_phrase_search",
    "q106_term_cooccurrence_lift",
    "q107_image_ahash_dedup",
    "q108_kmv_snapshot_overlap",
    "q109_page_history_scd2",
    "q110_kneser_ney_counts",
    "q111_zipf_vocab_coverage",
    "q112_url_path_templates",
    "q113_range_partition_boundaries",
    "q114_host_content_drift",
    "q115_postings_compression",
    # new in round 4 (sessions 4-5): mirror-cluster CC (large/small-star),
    # ANF reach sketches, DUST param-rule mining, TrustRank, HyperBall
    # harmonic centrality, rendezvous shard assignment
    "q95_mirror_cluster_canonical",
    "q96_anf_reach_sketch",
    "q97_dust_param_rules",
    "q98_trustrank",
    "q99_harmonic_centrality",
    "q100_rendezvous_shards",
    # new in round 4 (session 3): ingest / search-side products +
    # registrable-domain politeness + incremental index maintenance
    "q87_bm25_topk",
    "q88_mirror_host_pairs",
    "q89_shingle_containment",
    "q90_sitemap_discovery",
    "q91_cdx_offset_index",
    "q92_registrable_domain_rollup",
    "q93_incremental_index_update",
    "q94_aimd_rate_control",
    # new in round 4 (session 2): link-graph / crawl-scheduling /
    # index-build ops
    "q80_linkgraph_pagerank",
    "q81_crawl_trap_detector",
    "q82_revisit_scheduler",
    "q83_inverted_index",
    "q84_anchor_text_index",
    "q85_authority_frontier",
    "q86_snapshot_diff",
    # new in round 4
    "q73_simhash64_neardup",
    "q74_kmeans_ivf_assign",
    "q75_ann_ivf_trained_topk",
    "q76_scene_cut_detection",
    "q77_ann_pq_adc_rerank",
    "q78_classifier_quality_gate",
    "q79_ann_ivfpq_residual",
    # plan/code changed in round 4 (oversize-bucket cap reworked from a
    # window count to a census + broadcast anti-join; q62 lost its O(N)
    # broadcast hint; kmeans assignment reworked to the packed
    # zero-shuffle argmin feeding q47/q62/q74/q75) -> prior
    # certification no longer covers the code
    "q25_minhash_lsh_buckets",
    "q50_lsh_dedup_pipeline",
    "q53_simhash_neighbor_pairs",
    "q62_semantic_dedup",
]
# q119_unigram_surprisal_filter, q120_repeated_substring_spans, and
# q121_kcore_linkfarm (new, session 7) sit OUTSIDE the window: all 50
# slots are taken by round-4 queries awaiting their FIRST driver row
# (46 new + the 4 whose code changed this round). Their evidence is
# local: `python tools/compare_oracle.py /root/testdata/sf0.01 q119...`
# green + pure-Python recount pins in tests/test_session7_ops.py; see
# BENCH/BASELINE.md. Rotate them in next round.
# Rotated out to fit q116-q118 (window cap = 50): q29_langid_heuristic,
# q30_quality_score, q48_duration_tags — byte-unchanged since their
# r1/r2 driver rows (q29/q30) and r3 local certification (q48),
# re-verified locally this session via
# `python tools/compare_oracle.py` at sf0.01.
# Rotated out to fit q101-q115 (window cap = 50): q31_token_counts,
# q32_ann_cosine_topk, q35_global_budget_prefix, q36_politeness_slots,
# q37_url_canonicalize, q38_seen_antijoin_rounds, q39_circuit_breaker,
# q47_ann_ivf_topk, q49_validation_record, q51_ann_lsh_verified_neardup,
# q52_jsonld_extract, q54_winnowing_fingerprints,
# q55_multimodal_frame_sample, q56_ann_quantized_rerank,
# q57_boilerplate_chunk_dedup — byte-unchanged since their r1/r2 driver
# rows and re-verified locally this session via
# `python tools/compare_oracle.py` at sf0.01.


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry reordered so the driver's capped window certifies the
    queries that need fresh evidence (DRIVER_PRIORITY first, then the
    original registration order)."""
    front = [n for n in DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    return {n: QUERIES[n] for n in front + rest}


def ordered_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in ordered_queries() if n in ORACLES}
