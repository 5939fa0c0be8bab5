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

# The driver records CORRECTNESS rows for the FIRST 50 registry entries
# only, so ordering is the certification schedule. Front group = queries
# with no driver row yet (r2's corpus ops + the 14 that fell outside the
# r2 window) plus queries whose semantics changed this round (bucket
# caps, q43's tolerance oracle) plus new round-3 queries. Queries left
# outside the window are byte-identical to code already driver-certified
# in r1/r2 (standing evidence; see VERDICT.md round 2).
DRIVER_PRIORITY = [
    # never driver-certified (r2 registry positions 50-63)
    "q58_gopher_quality_rules",
    "q59_pii_scrub",
    "q60_ngram_decontamination",
    "q61_token_budget_mix",
    "q63_corpus_report",
    "q64_first_occurrence_chunk_dedup",
    "q65_training_set_selection",
    "q40_retry_backoff",
    "q44_salted_skew_join",
    "q21_tumbling_hourly",
    "q22_session_windows",
    "q23_sliding_hourly_by_30m",
    "q24_interevent_gaps",
    "q45_asof_last_click_before_purchase",
    # semantics/plan changed in round 3 (oversize-bucket caps; q43
    # tolerance oracle; q62's sketch-then-verify rework) -> prior
    # certification no longer covers the code
    "q43_approx_distinct_users",
    "q25_minhash_lsh_buckets",
    "q50_lsh_dedup_pipeline",
    "q53_simhash_neighbor_pairs",
    "q62_semantic_dedup",
    # new in round 3
    "q66_chunk_dedup_hashkey",
    "q67_multimodal_bmp_decode",
    "q68_sequence_packing",
    "q69_stratified_split",
    "q70_intradoc_chunk_dedup",
    "q71_temperature_mix_weights",
    "q72_multimodal_wav_decode",
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
