"""Session-21 operator against a pure-Python recount:

- q199 source-diversity report: full per-language + corpus recount
  (census, Simpson ppm with the exact n^2 common denominator, effective
  sources, struct-max top-source tiebreak) + discrimination pins (the
  flag fires somewhere and not everywhere; effective <= nominal always).
"""

from __future__ import annotations

import collections
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.001"
TOP = 500


def _census():
    rows = duckdb.sql(
        f"SELECT lang, source, COUNT(*) FROM '{SF}/documents.parquet'"
        " GROUP BY 1, 2"
    ).fetchall()
    return rows


def _roll(counts):
    """counts: {source: n} -> the q199 row tuple (minus lang)."""
    n_docs = sum(counts.values())
    n_sources = len(counts)
    sq = sum(n * n for n in counts.values())
    # struct-max semantics: max n, ties to lexicographically LAST source
    top_n, top_source = max((n, s) for s, n in counts.items())
    top_share = (1000 * top_n) // n_docs
    simpson = (1000000 * sq) // (n_docs * n_docs)
    eff = (1000 * n_docs * n_docs) // sq
    conc = top_share > TOP or 50 * eff < 41000 * n_sources
    return (n_docs, n_sources, top_source, top_share, simpson, eff, conc)


def _py_diversity():
    per = collections.defaultdict(dict)
    alls: collections.Counter = collections.Counter()
    for lang, source, n in _census():
        per[lang][source] = per[lang].get(source, 0) + n
        alls[source] += n
    out = {lang: _roll(c) for lang, c in per.items()}
    out["<all>"] = _roll(dict(alls))
    return out


def test_q199_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q199_source_diversity,
    )

    want = _py_diversity()
    got = {
        r.lang: (
            r.n_docs,
            r.n_sources,
            r.top_source,
            r.top_share_permille,
            r.simpson_ppm,
            r.effective_sources_milli,
            r.concentrated,
        )
        for r in q199_source_diversity(spark, SF).collect()
    }
    assert got == want
    # effective sources can never exceed nominal (Cauchy-Schwarz)
    assert all(v[5] <= 1000 * v[1] for v in got.values())
    # the flag discriminates on this fixture: fires somewhere, not everywhere
    assert any(v[6] for v in got.values())
    assert any(not v[6] for v in got.values())
