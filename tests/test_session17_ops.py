"""Session-17 operators against pure-Python recounts:

- q189 crawl-trap detection: full per-host recount of the URL/content
  censuses + ratio/flag, and a discrimination pin (both flag values
  present, exactly the planted hosts flagged);
- q190 sitemap ingestion: closed-form recount of the expected frontier
  candidates (newest lastmod per loc, freshness cutoff, seen anti-join)
  — pins the XML build -> regex-parse round trip against ground truth;
- q191 mirror-host detection: full pair recount (census, df cap,
  Jaccard permille) + pins that the corpus-wide boilerplate fingerprint
  was capped out and that the flag discriminates (drift twins);
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
def _py_sitemap(eids):
    H, P, D, CUT, SEEN = 25, 499, 30, 15, 3
    best: dict = {}
    for e in eids:
        key = (f"h{e % H}", e % P)
        lm = e % D
        if best.get(key, -1) < lm:
            best[key] = lm
    return {
        (host, f"https://{host}/p{pk}", lm)
        for (host, pk), lm in best.items()
        if lm >= CUT and pk % SEEN != 0
    }


def test_q190_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.ingest import (
        q190_sitemap_ingestion,
    )

    want = _py_sitemap(_events())
    got = {
        (r.host, r.url, r.lastmod)
        for r in q190_sitemap_ingestion(spark, SF).collect()
    }
    assert got == want
    assert got  # freshness + seen filters leave a non-empty frontier
    # and they actually filtered something
    assert len(got) < len({(e % 25, e % 499) for e in _events()})


# ----------------------------------------------------------------- q191
def _py_mirror(eids):
    H, G, B, BOIL, EVERY, CAP, TH, DRIFT = 40, 20, 29, 999999, 50, 8, 800, 15
    fps = collections.defaultdict(set)
    for e in eids:
        hid = e % H
        k = e // H
        if k % EVERY == 0:
            fp = BOIL
        else:
            fp = (hid % G) * 1000 + k % (B + hid // G)
            if hid >= G and (hid % G) % 5 == 4:
                fp += DRIFT
        fps[f"h{hid}"].add(fp)
    df = collections.Counter()
    for host, s in fps.items():
        for fp in s:
            df[fp] += 1
    kept = {fp for fp, c in df.items() if c <= CAP}
    hosts = sorted(fps)
    out = {}
    for i, a in enumerate(hosts):
        for b in hosts[i + 1 :]:
            shared = len((fps[a] & fps[b]) & kept)
            if not shared:
                continue
            na, nb = len(fps[a]), len(fps[b])
            jac = (1000 * shared) // (na + nb - shared)
            out[(a, b)] = (shared, na, nb, jac, jac >= TH)
    return out


def test_q191_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q191_mirror_host_detection,
    )

    want = _py_mirror(_events())
    got = {
        (r.host_a, r.host_b): (
            r.shared,
            r.n_fp_a,
            r.n_fp_b,
            r.jaccard_permille,
            r.is_mirror,
        )
        for r in q191_mirror_host_detection(spark, SF).collect()
    }
    assert got == want


def test_q191_boilerplate_capped_and_flag_discriminates(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        q191_mirror_host_detection,
    )

    rows = q191_mirror_host_detection(spark, SF).collect()
    # the corpus-wide boilerplate fp co-occurs on all 40 hosts; had the
    # df cap not dropped it, every cross-group pair would appear (780
    # pairs) — only the 20 within-group twin pairs may survive
    assert {(r.host_a, r.host_b) for r in rows} == {
        tuple(sorted((f"h{g}", f"h{g + 20}"))) for g in range(20)
    }
    assert any(r.is_mirror for r in rows) and any(not r.is_mirror for r in rows)
    # drift twins (group % 5 == 4) are exactly the sub-threshold pairs
    drifted = {tuple(sorted((f"h{g}", f"h{g + 20}"))) for g in range(4, 20, 5)}
    assert {(r.host_a, r.host_b) for r in rows if not r.is_mirror} == drifted


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
