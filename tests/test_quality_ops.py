"""Corpus quality/safety operators (q58-q65 + q62): focused semantic
checks beyond the oracle-hash gate — the flags actually discriminate,
redaction removes every detected span, decontamination marks exactly the
overlapping docs, the mix sampler respects its budget, semantic dedup's
dominance rule is consistent, and first-occurrence chunk dedup matches a
pure-Python oracle on adversarial fixtures.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    _MIX_BUDGET_TOKENS,
    q58_gopher_quality_rules,
    q59_pii_scrub,
    q60_ngram_decontamination,
    q61_token_budget_mix,
)

SF = "/root/testdata/sf0.001"


def test_gopher_rules_discriminate(spark):
    rows = q58_gopher_quality_rules(spark, SF).collect()
    kept = [r for r in rows if r.keep]
    assert 0 < len(kept) < len(rows), "keep flag must split the corpus"
    for r in rows:
        assert 0.0 <= r.dup_2gram_frac <= 1.0
        assert 0.0 <= r.stopword_frac <= 1.0
        assert r.mean_word_len > 0


def test_pii_scrub_removes_every_span(spark):
    import re

    rows = q59_pii_scrub(spark, SF).collect()
    email = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
    assert any(r.n_phones > 0 for r in rows) and any(r.n_phones == 0 for r in rows)
    assert any(r.n_ips > 0 for r in rows) and any(r.n_ips == 0 for r in rows)
    for r in rows:
        assert r.n_emails >= 1  # every doc got a synthesized contact line
        assert r.n_redactions == r.n_emails + r.n_phones + r.n_ips
        assert not email.search(r.redacted_tail), r.redacted_tail
        assert "555-" not in r.redacted_tail.replace("<PHONE>", "")


def test_decontamination_excludes_benchmark_docs(spark):
    rows = q60_ngram_decontamination(spark, SF).collect()
    assert all(r.doc_id % 23 != 0 for r in rows)
    assert any(r.contaminated for r in rows)
    assert any(not r.contaminated for r in rows)
    for r in rows:
        assert r.contaminated == (r.n_hits > 0)


def test_token_budget_mix_respects_budget(spark):
    rows = q61_token_budget_mix(spark, SF).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert by_source, "sampler kept nothing"
    for _, docs in by_source.items():
        assert max(d.cum_tokens for d in docs) <= _MIX_BUDGET_TOKENS
        assert sum(d.n_tokens for d in docs) == max(d.cum_tokens for d in docs)


def test_semantic_dedup_dominance_consistency(spark):
    from webscraping_video_pipeline_spark.contract.similarity import q62_semantic_dedup

    rows = q62_semantic_dedup(spark, SF).collect()
    kept = [r for r in rows if r.kept]
    dropped = [r for r in rows if not r.kept]
    assert kept and dropped, "semantic dedup must split the corpus"
    # every dropped vector has at least one near-dup; isolated vectors survive
    for r in dropped:
        assert r.n_neardups >= 1
    for r in rows:
        if r.n_neardups == 0:
            assert r.kept
    # within a cell, the highest-centroid-cos member of any near-dup group
    # is never dropped by a LOWER-cos neighbor: the max-cos vector per cell
    # with near-dups must be kept unless tied
    best = {}
    for r in rows:
        if r.cell not in best or r.centroid_cos > best[r.cell].centroid_cos:
            best[r.cell] = r
    for b in best.values():
        assert b.kept


def test_corpus_report_internally_consistent(spark):
    from webscraping_video_pipeline_spark.contract.quality import q63_corpus_report

    rows = q63_corpus_report(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_keep <= r.n_docs
        assert 0 <= r.n_benchmark <= r.n_docs
        assert 0 <= r.n_contaminated <= r.n_docs - r.n_benchmark
        assert 0 <= r.n_exact_dups < r.n_docs
        assert r.total_tokens > r.n_docs  # docs have > 1 token each


def test_first_occurrence_dedup_keeps_exactly_one_copy(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q64_first_occurrence_chunk_dedup,
    )

    rows = q64_first_occurrence_chunk_dedup(spark, SF).collect()
    assert any(r.n_dropped > 0 for r in rows), "corpus has repeated chunks"
    # re-chunking every cleaned text must yield globally UNIQUE chunks
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_chunks
        # fully-deduplicated docs come back with empty cleaned text
        assert (r.n_dropped == r.n_chunks) == (r.cleaned_text == "")
    # every document survives as a row, even when all its chunks dropped
    assert len({r.doc_id for r in rows}) == len(rows)


def test_training_set_selection_composes_gates(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q58_gopher_quality_rules,
        q65_training_set_selection,
    )

    manifest = q65_training_set_selection(spark, SF).collect()
    assert manifest
    kept_ids = {r.doc_id for r in q58_gopher_quality_rules(spark, SF).collect() if r.keep}
    for r in manifest:
        assert r.doc_id in kept_ids  # only quality survivors reach the mix
        assert r.cum_tokens <= 600
    by_source = {}
    for r in manifest:
        by_source.setdefault(r.source, []).append(r)
    for docs in by_source.values():
        assert sum(d.n_tokens for d in docs) == max(d.cum_tokens for d in docs)


def test_first_occurrence_dedup_edge_cases(spark, tmp_path):
    """Hand-built adversarial corpus: within-doc repetition, fully
    identical docs, and sub-chunk-length docs — checked against a
    pure-Python oracle of the first-occurrence rule."""
    from webscraping_video_pipeline_spark import schemas
    from webscraping_video_pipeline_spark.contract.quality import (
        q64_first_occurrence_chunk_dedup,
    )

    texts = {
        0: "x x x x x x x x x",      # 3 identical chunks -> keep 1
        1: "x x x x x x",            # chunks already seen in doc 0
        2: "a b c a b c a b c",      # repeated chunk within doc
        3: "a b c d e f",            # first chunk seen (doc 2), second new
        4: "zz",                     # single short chunk
        5: "zz",                     # identical doc -> fully dropped
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    df = spark.createDataFrame(rows, schema=schemas.DOCUMENTS)
    d = str(tmp_path / "edge")
    df.write.parquet(f"{d}/documents.parquet")

    # pure-Python oracle
    def chunks(t):
        ws = t.split(" ")
        return [" ".join(ws[i : i + 3]) for i in range(0, len(ws), 3)]

    seen, want = set(), {}
    for i in sorted(texts):
        kept, dropped = [], 0
        for c in chunks(texts[i]):
            if c in seen:
                dropped += 1
            else:
                seen.add(c)
                kept.append(c)
        want[i] = (len(chunks(texts[i])), dropped, " ".join(kept))

    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in q64_first_occurrence_chunk_dedup(spark, d).collect()
    }
    assert got == want
