"""Session-17 operators against pure-Python recounts:

- q189 crawl-trap detection: full per-host recount of the URL/content
  censuses + ratio/flag, and a discrimination pin (both flag values
  present, exactly the planted hosts flagged);
- q190 takedown compliance: full per-rule recount (whole-host and
  prefix-scoped purge accounting) + pins that both rule kinds match;
- q191 length-bucket padding: sequential recount of both batching
  policies (global queue vs pow2 length buckets) + pins that bucketing
  strictly reduces padding waste on this corpus;
- q192 context-fill curve: per-ctx recount of chunk counts, fill and
  boundary-straddle statistics from a sequential prefix sum.
"""

from __future__ import annotations

import collections
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF = "/root/testdata/sf0.001"


def _events():
    return [
        r[0]
        for r in duckdb.sql(f"SELECT event_id FROM '{SF}/events.parquet'").fetchall()
    ]


# ----------------------------------------------------------------- q189
def _py_trap(eids):
    H, M, P, C, R = 40, 8, 201, 11, 2
    fetches = collections.Counter()
    urls = collections.defaultdict(set)
    cks = collections.defaultdict(set)
    for e in eids:
        hid = e % H
        host = f"h{hid}"
        pk = e % P
        if hid % M == 0:
            url = f"{host}/p{pk % C}?sid={e // H}"
            ck = pk % C
        else:
            url, ck = f"{host}/p{pk}", pk
        fetches[host] += 1
        urls[host].add(url)
        cks[host].add(ck)
    out = {}
    for host in fetches:
        nu, nc = len(urls[host]), len(cks[host])
        out[host] = (
            fetches[host],
            nu,
            sum(1 for u in urls[host] if "?" in u),
            nc,
            (1000 * nu) // nc,
            nu >= R * nc,
        )
    return out


def test_q189_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.resolve import (
        q189_crawl_trap_detection,
    )

    want = _py_trap(_events())
    got = {
        r.host: (
            r.n_fetches,
            r.n_urls,
            r.n_param_urls,
            r.n_content,
            r.urls_per_content_permille,
            r.is_trap,
        )
        for r in q189_crawl_trap_detection(spark, SF).collect()
    }
    assert got == want


def test_q189_fixture_discriminates(spark):
    from webscraping_video_pipeline_spark.contract.resolve import (
        q189_crawl_trap_detection,
    )

    rows = q189_crawl_trap_detection(spark, SF).collect()
    flagged = {r.host for r in rows if r.is_trap}
    assert flagged == {f"h{h}" for h in range(40) if h % 8 == 0}
    assert any(not r.is_trap for r in rows)
    # trap hosts are exactly the ones minting query-param URL variants
    assert all((r.n_param_urls > 0) == r.is_trap for r in rows)


# ----------------------------------------------------------------- q190
def _py_takedown(eids):
    H, P = 40, 201
    pats = [
        ("h7", None), ("h13", None), ("h21", None),
        ("h3", "/p1"), ("h5", "/p4"), ("h11", "/p9"),
        ("h11", "/p19"), ("h30", "/p2"),
    ]
    out = {}
    for ph, pp in pats:
        fetches, urls, by = 0, set(), 0
        for e in eids:
            host = f"h{e % H}"
            if host != ph:
                continue
            url = f"{host}/p{e % P}"
            if pp is not None and not url.startswith(ph + pp):
                continue
            fetches += 1
            urls.add(url)
            by += 100 + e % 900
        if fetches:
            out[(ph, pp or "<entire host>")] = (fetches, len(urls), by)
    return out


def test_q190_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q190_takedown_compliance,
    )

    want = _py_takedown(_events())
    got = {
        (r.p_host, r.p_prefix): (r.n_fetches_purged, r.n_urls_purged, r.bytes_purged)
        for r in q190_takedown_compliance(spark, SF).collect()
    }
    assert got == want
    # both rule kinds matched something
    assert any(p == "<entire host>" for _, p in got)
    assert any(p != "<entire host>" for _, p in got)
    # prefix rules purge strictly less than their whole host would
    assert got[("h3", "/p1")][0] < sum(1 for e in _events() if e % 40 == 3)


# ----------------------------------------------------------------- q191
def _py_padding():
    toks = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) FROM '{SF}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    BOUNDS, B = (16, 32, 64, 128, 256), 32

    def bucket_of(tok):
        for i, b in enumerate(BOUNDS):
            if tok <= b:
                return i
        return len(BOUNDS)

    out = {}
    for policy in ("none", "pow2"):
        batches = collections.defaultdict(list)
        per_bucket = collections.Counter()
        for _d, tok in toks:
            bk = 0 if policy == "none" else bucket_of(tok)
            idx = per_bucket[bk] // B
            per_bucket[bk] += 1
            batches[(bk, idx)].append(tok)
        total = sum(sum(v) for v in batches.values())
        padded = sum(max(v) * len(v) for v in batches.values())
        out[policy] = (
            len(batches),
            total,
            padded,
            padded - total,
            (1000 * (padded - total)) // padded,
        )
    return out


def test_q191_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q191_length_bucket_padding,
    )

    want = _py_padding()
    got = {
        r.policy: (
            r.n_batches,
            r.total_tokens,
            r.padded_tokens,
            r.wasted_tokens,
            r.waste_permille,
        )
        for r in q191_length_bucket_padding(spark, SF).collect()
    }
    assert got == want
    # the bucketing ladder must actually pay off on this corpus
    assert got["pow2"][3] < got["none"][3]
    assert got["none"][3] > 0  # and the unbucketed queue really wastes


# ----------------------------------------------------------------- q192
def _py_fill():
    toks = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) FROM '{SF}/documents.parquet'"
        " ORDER BY doc_id"
    ).fetchall()
    out = {}
    for ctx in (64, 256, 1024):
        cum = 0
        split = 0
        total = 0
        for _d, tk in toks:
            start, cum = cum, cum + tk
            total += tk
            if start // ctx != (cum - 1) // ctx:
                split += 1
        chunks = (total + ctx - 1) // ctx
        out[ctx] = (
            len(toks),
            total,
            chunks,
            (1000 * total) // (chunks * ctx),
            split,
            (1000 * split) // len(toks),
        )
    return out


def test_q192_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        q192_context_fill_curve,
    )

    want = _py_fill()
    got = {
        r.ctx: (
            r.n_docs,
            r.total_tokens,
            r.n_chunks,
            r.fill_permille,
            r.docs_split,
            r.split_permille,
        )
        for r in q192_context_fill_curve(spark, SF).collect()
    }
    assert got == want
    # monotone trade-off: larger ctx never splits FEWER docs... the
    # reverse: larger ctx splits fewer docs, wastes more fill
    ctxs = sorted(got)
    for lo, hi in zip(ctxs, ctxs[1:]):
        assert got[hi][4] <= got[lo][4]  # docs_split shrinks with ctx
