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
# only, so ordering is the certification schedule. Round-5 window
# (chosen per the r4 VERDICT "next round" item 1, changed-set derived
# MECHANICALLY by tools/changed_queries.py against the `round4` git
# tag — tests/test_contract.py pins that every changed query is in the
# window or explicitly justified in WINDOW_WAIVED below, a list added in
# session 17 when the changed set outgrew the 50 slots):
#   - the 5 queries whose code changed in round 5 outside the
#     never-certified block (q13/q126/q128/q132 ordinal + guard fixes,
#     q154 new physics-realism twin);
#   - the 35 queries no CORRECTNESS_r*.json row has ever covered
#     (q101-q115, q134-q153 — r4 evidence was local sweeps only; this
#     converts it to driver evidence). q137/q142/q143/q144/q146/q148
#     also changed in round 5 and are inside this block;
#   - the operators NEW in round 5 (q155-q175, q177-q195 minus the
#     waived thin-consumer rows — sessions 2-18: audio/video near-dup,
#     BPE train/encode, DSIR, host-prior gate, ANN recall eval, KN
#     perplexity, seed BFS, CDC chunking, decontamination/split/audit
#     trio, retrieval-eval quartet, session-12 quintet, graph/eval ops,
#     LPA, trap/takedown/padding/fill (s17), skew/b-bit/footrule (s18))
#     and the round-5 q103 water-fill rework;
#   - 3 of the 5 queries changed in round 4 OUTSIDE the r4 window
#     (q47/q49/q56 — the omission the r4 VERDICT flagged); q34/q43 and
#     the round-1 stale slots (q01/q03) yielded to the new operators —
#     they are byte-unchanged since their last green driver rows and
#     were re-proven by the r4-session local sweeps.
# Every query outside the window rides the round-5 capstone
# full-registry sweeps on the final tree (see BENCH/BASELINE.md, latest
# '197 pass, 0 fail, 0 rows-only' — the session-22 final-tree sweep over
# the complete registry) plus, where byte-unchanged since
# round 4, the final round-4 sweep ('152 pass, 0 fail, 0 rows-only').
DRIVER_PRIORITY = [
    # new in round 5 (never certified, new code)
    "q155_audio_fingerprint_dedup",
    "q156_video_framehash_neardup",
    "q157_bpe_merge_train",
    # new in round 5, session 10 (never certified, new code); their three
    # slots came from q112/q134/q139 — single-rollup twins byte-unchanged
    # since their r4 additions, each locally sweep-green every round with
    # dedicated pytest pins, and certifying never-run NEW code outranks
    # converting local evidence (the q105/q153 precedent)
    "q165_fuzzy_decontamination",
    "q166_leakage_free_split",
    # q167's slot moved on to the brand-new q199 in session 21: q167 is
    # a deterministic per-source sample rollup whose census machinery is
    # certified across the windowed sampling family (q169 reservoir,
    # q166 split, q198 allocation) and carries test_session10_ops
    # recount pins — WINDOW_WAIVED below. q199's Simpson/effective-count
    # diversity arithmetic is machinery no driver row covers.
    "q199_source_diversity",
    # new in round 5, session 11 (never certified, new code); their four
    # slots came from q104/q106/q108/q109 — byte-unchanged since their
    # r4-session-6 additions, locally sweep-green every round with
    # dedicated test_session6_ops pins (same precedent as above)
    "q168_classifier_pr_sweep",
    "q169_weighted_reservoir_sample",
    "q170_tokenizer_fertility",
    "q171_bm25_hard_negatives",
    # new in round 5, session 12 (never certified, new code); its slot
    # came from q149_host_traffic_trend — the smallest never-certified
    # single-rollup twin, byte-unchanged since its r4-session-8 addition,
    # locally sweep-green every round with a dedicated test_session8_ops
    # pin (same precedent as q105/q153/q112/q134/q139/q104/q106/q108/q109)
    "q172_embedding_decontamination",
    # q173's slot came from q135_politeness_compliance_audit (next-smallest
    # never-certified rollup twin, pinned in test_session8_ops — same
    # precedent)
    "q173_duplicate_span_extraction",
    # q174's slot came from q114_host_content_drift (next-smallest
    # never-certified twin, pinned in test_session6_ops — same precedent)
    # q174's slot moved on to the brand-new q197 in session 20: q174's
    # register MAX-merge is independently certified end-to-end by the
    # streaming HLL twin's stream≡batch pins (test_streaming_hll) plus
    # its session-12 recount pins — WINDOW_WAIVED below. q197's
    # one-pass Poisson-bootstrap machinery is new.
    "q197_poisson_bootstrap_ci",
    # q175's slot came from q138_term_proximity_scoring (next-smallest
    # never-certified twin, pinned in test_session8_ops — same precedent)
    "q175_bitext_mining",
    # q177's slot came from q152_storage_tier_assignment (the simplest
    # remaining never-certified twin — a when/otherwise bucketing rollup,
    # pinned in test_session8_ops — same precedent). A first cut of this
    # slot (q176 anchor-text aggregation) was REMOVED the same session:
    # it substantially duplicated q84_anchor_text_index.
    # q177's slot moved on to the brand-new q198 in session 20: q177's
    # additive bucket state is independently certified end-to-end by
    # the streaming HDR twin's stream≡batch pins (test_streaming_hdr)
    # plus its session-12 recount pins — WINDOW_WAIVED below. q198's
    # integer Neyman/Hamilton apportionment is new.
    "q198_neyman_allocation",
    # q178's slot (which came from q145_khop_bowtie_profile) moved on to
    # the brand-new q189 in session 17: q178 is a skinny histogram over
    # q50's DRIVER-CERTIFIED cluster builder (q50 green r4), pinned in
    # test_session12_ops and locally sweep-green — it is WINDOW_WAIVED
    # below. q189's trap censuses are machinery no driver row covers.
    "q189_crawl_trap_detection",
    # round-5 code changes outside the never-certified block (q35: the
    # session-9 shard-pruned two-level budget prefix — its slot came from
    # q105_phrase_search, the simplest never-certified query: a single
    # regex-filter twin whose oracle is nearly the same SQL text, locally
    # sweep-green every round — certifying CHANGED code outranks it)
    "q13_batch_slices",
    "q35_global_budget_prefix",
    "q126_content_spam_features",
    "q128_trigram_langid_train",
    "q132_quality_calibration_curve",
    "q154_physics_realism",
    # never driver-certified: sessions 5/6 of round 4
    # q101_cms_heavy_hitters yielded its slot to the brand-new q184
    # (session 15): q101 is byte-unchanged since its r4-session-5
    # addition, locally sweep-green every round with test_session5_ops
    # pins, and two sibling sketch operators already sit in this window
    # (q174 HLL registers, q177 HDR buckets) — the lowest marginal
    # evidence among the remaining never-certified block
    # q184's slot moved on to the brand-new q196 in session 19: q184's
    # S-curve sweep rides the certified q25/q26 LSH machinery (q25
    # driver-green; q194 — in this window — freshly certifies the
    # min-wise hash layer from a second consumer) and carries
    # test_session15_ops recount pins — WINDOW_WAIVED below. q196's
    # k-occurrence hubness census is machinery no driver row covers.
    "q196_ann_hubness_audit",
    # q102_latency_percentiles yielded its slot to the brand-new q183
    # (session 15): q102 is byte-unchanged since its r4-session-5
    # addition, locally sweep-green every round with test_session5_ops
    # pins, and q177 (in this window) certifies the same latency-
    # quantile machinery end-to-end — the lowest marginal evidence
    # among the remaining never-certified block
    # q183's slot moved on to the brand-new q195 in session 18: q183
    # shares its certified rank-tail machinery with q182 (which stays
    # windowed) and carries test_session15_ops recount pins — it is
    # WINDOW_WAIVED below. q195's footrule decorrelation audit is
    # machinery no driver row covers.
    "q195_shuffle_quality_audit",
    "q103_fair_budget_allocation",
    # q107_image_ahash_dedup yielded its slot to the brand-new q182
    # (session 14): q107 is byte-unchanged since its r4-session-6
    # addition, locally sweep-green every round with test_session6_ops
    # pins, and q156 (in this window) certifies the same frame-hash +
    # hash-key-dedup machinery end-to-end — the lowest marginal
    # evidence among the remaining never-certified block (q110/q111
    # etc. carry round-5 code changes and MUST stay windowed)
    "q182_recrawl_priority",
    "q110_kneser_ney_counts",
    "q111_zipf_vocab_coverage",
    # q113_range_partition_boundaries yielded its slot to the brand-new
    # q185 (session 16): q113 is byte-unchanged since its r4 addition,
    # locally sweep-green every round (this session's 182/182 full sweep
    # included), and its machinery (sampled range boundaries) also rides
    # the driver-green q13 slice plan — same precedent as q102/q107
    "q185_label_propagation_communities",
    # q114_host_content_drift yielded its slot to the brand-new q174
    # (see the session-12 note above)
    # q115_postings_compression yielded its slot to q186 (session 16),
    # which in turn yielded to the brand-new q190 in session 17: q186 is
    # a thin weight map over the same certified q50 cluster builder as
    # q178, pinned in test_session16_ops — WINDOW_WAIVED below. q190's
    # takedown purge ledger (broadcast rule join + per-rule rollup) is
    # machinery no driver row covers. (A first cut of this slot — a
    # sitemap-XML ingest — was REMOVED the same session: it
    # substantially duplicated q90_sitemap_discovery, the q176
    # precedent.)
    "q190_takedown_compliance",
    # never driver-certified: session 8 late additions (q137/q142/q143/
    # q144/q146/q148 also carry round-5 code changes)
    # q135_politeness_compliance_audit yielded its slot to the brand-new
    # q173 (see the session-12 note above)
    # q136_maxscore_block_skip yielded its slot to the brand-new q187
    # (session 16): q136 is byte-unchanged since its r4-session-8
    # addition, locally sweep-green every round with test_session8_ops
    # pins, and its WAND family already carries the driver-green q123
    # block-max row — same precedent
    # q187's slot moved on to the brand-new q193 in session 18: q187
    # rides sharded_ordinal (certified via the windowed q144/q146) and
    # the first-occurrence-census idiom its windowed siblings q111/q146
    # also certify, with full-curve recount pins in test_session16_ops —
    # WINDOW_WAIVED below. q193's strategy-sweep skew censuses are the
    # north rule's explicit-skew evidence; new machinery wins the slot.
    "q193_partition_skew_audit",
    "q137_line_density_boilerplate",
    # q138_term_proximity_scoring yielded its slot to the brand-new q175
    # (see the session-12 note above)
    # q140_discovery_attribution yielded its slot to the brand-new q180
    # (session 13): q140 is a single seen-set rollup, byte-unchanged since
    # its r4-session-8 addition, locally sweep-green every round with a
    # test_session8_ops budget-conservation pin — same precedent as q147
    # q180's slot moved on to the brand-new q194 in session 18: q180's
    # hub-pruned wedge machinery shares its census discipline with the
    # windowed q179 triangles and carries test_session13_ops recount
    # pins — WINDOW_WAIVED below. q194's b-bit sketch estimator is
    # machinery no driver row covers.
    "q194_bbit_minhash_estimate",
    # q141_robots_change_impact yielded its slot to the brand-new q181
    # (session 14): q141 is byte-unchanged since its r4-session-8
    # addition, locally sweep-green every round with a test_session8_ops
    # pin, and its operator family already carries driver-green rows
    # (q45 robots as-of semantics, q129 RFC 9309 matcher) — the lowest
    # marginal evidence among the never-certified block
    "q181_retrieval_ndcg_eval",
    "q142_memorization_risk_audit",
    "q143_ensemble_quality_gate",
    "q144_epoch_shuffle_plan",
    # q145_khop_bowtie_profile yielded its slot to the brand-new q178
    # (see the session-12 note above)
    "q146_stable_term_ids",
    # q147_fetch_fairness_index yielded its slot to the brand-new q179
    # (session 13): q147 is a single exact-moment rollup, byte-unchanged
    # since its r4-session-8 addition, locally sweep-green every round
    # with a test_session8_ops moment-recount pin — same precedent as
    # q105/q153/q112/q134/q139/q104/q106/q108/q109/q149/q152/q114/
    # q135/q138/q145
    "q179_triangle_clustering",
    "q148_corpus_build_pipeline",
    # q149_host_traffic_trend yielded its slot to the brand-new q172
    # (see the session-12 note above)
    # q150_crawl_round_report yielded its slot to the brand-new q188
    # (session 16): q150 is a single multi-metric rollup, byte-unchanged
    # since its r4-session-8 addition, locally sweep-green every round
    # with a test_session8_ops recount pin — same precedent; that slot
    # moved on to the brand-new q191 in session 17: q188 is an ntile
    # band over q161's KN bits, and BOTH halves of its machinery stay
    # windowed (q161 certifies the bits, q132 the distributed ntile) —
    # q188 is WINDOW_WAIVED below, pinned in test_session16_ops. q191's
    # two-policy padded-batch audit (per-bucket sharded ordinals +
    # batch-max rollups) is machinery no driver row covers. (A first
    # cut of this slot — a mirror-host census — was REMOVED the same
    # session: it substantially duplicated q88_mirror_host_pairs.)
    "q191_length_bucket_padding",
    "q151_index_shard_forecast",
    # q152_storage_tier_assignment yielded its slot to the brand-new q177
    # (see the session-12 note above)
    # q153 (referential-integrity audit) yielded its slot to the brand-new
    # q164: q153 is byte-unchanged since its r4-session-8 addition, rides
    # the full-registry local sweeps + its test_session8_ops pins, and
    # certifying never-run NEW code outranks converting local evidence
    "q164_cdc_chunk_dedup",
    # changed in round 4 outside the r4 window (r4 VERDICT hygiene flag):
    # q34/q43/q47/q49/q56 all yielded their slots to brand-new round-5
    # operators (q159-q163 — never certified at all vs re-certifying code
    # already driver-green in earlier rounds and locally re-proven by the
    # r4/r5 full-registry sweeps, which every displaced query rides)
    "q159_host_prior_quality_gate",
    "q160_ann_recall_eval",
    # new in round 5, session 3 (never certified, new code)
    "q161_kn_perplexity_filter",
    "q162_seed_bfs_layers",
    "q163_bpe_encode_tokens",
    # new in round 5, session 2 (never certified, new code); q119 rides
    # along because q158 imports lm.py's _FLOG2_* constants and the
    # mechanical detector (tools/changed_queries.py) flags every query
    # referencing a touched shared name. The round-1 stale-cert fillers
    # (q01/q03) yielded their slots — they are byte-unchanged since
    # their green round-1 rows and ride the r4 full-registry sweep.
    "q158_dsir_importance_resample",
    # q119's slot (it rode along only because q158 imports lm.py's
    # _FLOG2_* constants — its own body is byte-unchanged since its
    # driver-green r4 row) moved on to the brand-new q192 in session 17;
    # q119 is WINDOW_WAIVED below, pinned in test_session7/8_ops.
    "q192_context_fill_curve",
]

# Changed-or-new queries that do NOT fit the 50-slot driver window this
# round (the session-17 additions pushed the mechanically-derived
# changed set to 54). Each entry names code whose own machinery is
# certified by a windowed or prior-round driver row, carries a dedicated
# pytest recount pin, and rides the full-registry local sweeps —
# tools/changed_queries.py and tests/test_contract.py enforce that every
# changed query is either windowed or listed (and justified) here.
WINDOW_WAIVED = [
    # thin consumers of q50's driver-certified (r4) LSH cluster builder:
    "q178_dup_cluster_histogram",  # test_session12_ops recount pin
    # session-18 rotations — certified-family machinery + dedicated pins:
    "q187_heaps_vocab_growth",  # test_session16_ops full-curve recount
    "q183_crawl_order_eval",  # test_session15_ops recount (q182 windowed)
    "q180_adamic_adar_links",  # test_session13_ops recount (q179 windowed)
    "q184_lsh_banding_calibration",  # test_session15_ops recount (q25/q194 windowed)
    "q174_hll_url_cardinality",  # test_session12_ops + streaming-HLL twin pins
    "q177_hdr_latency_sketch",  # test_session12_ops + streaming-HDR twin pins
    "q167_source_sample_audit",  # test_session10_ops recount (q169/q166/q198 windowed)
    "q186_soft_dedup_weights",  # test_session16_ops identity pins
    # ntile band over q161's KN bits — q161 AND q132 (the distributed-
    # ntile certifier) both remain windowed:
    "q188_ccnet_lang_terciles",  # test_session16_ops recount pin
    # flagged only via shared _FLOG2_* constants; body byte-unchanged
    # since its driver-green r4 row:
    "q119_unigram_surprisal_filter",  # test_session7/8_ops pins
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
