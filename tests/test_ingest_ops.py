"""Behavioral pins for the ingest / search-side operators
(contract/ingest.py) beyond the driver's value-hash oracle: an
independent pure-Python BM25 recompute for q87, a pure-Python
mirror-pair recompute for q88, containment algebra for q89, a seen-set
exclusion + md5-fanout recompute for q90, and a per-file offset chain +
record digest recompute for q91.
"""

from __future__ import annotations

import hashlib
import math
import sys
from collections import Counter, defaultdict

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.ingest import (  # noqa: E402
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _BM25_TOPK,
    _MIRROR_DF_CAP,
    _MIRROR_HOSTS,
    _MIRROR_SHINGLE,
    _SITEMAP_FANOUT,
    _SITEMAP_HOSTS,
    q87_bm25_topk,
    q88_mirror_host_pairs,
    q89_shingle_containment,
    q90_sitemap_discovery,
    q91_cdx_offset_index,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def test_bm25_matches_pure_python_recompute(spark):
    docs = _docs(spark)
    toks = {i: r["text"].lower().split(" ") for i, r in docs.items()}
    nd = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / nd
    df = Counter(t for w in toks.values() for t in set(w) if t in _BM25_TERMS)
    want = []
    for i, w in toks.items():
        tf = Counter(t for t in w if t in _BM25_TERMS)
        if not tf:
            continue
        s = 0.0
        for term, f in tf.items():
            idf = math.log(1.0 + (nd - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * (f * (_BM25_K1 + 1.0)) / (
                f + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * (len(w) / avgdl))
            )
        want.append((-s, i, len(tf)))
    want.sort()
    got = sorted(q87_bm25_topk(spark, SF).collect(), key=lambda r: r["rk"])
    assert [r["rk"] for r in got] == list(range(1, _BM25_TOPK + 1))
    for r, (neg_s, i, n_terms) in zip(got, want[:_BM25_TOPK]):
        assert r["doc_id"] == i and r["n_terms"] == n_terms
        assert abs(r["score"] - (-neg_s)) < 1e-9


def _host_shingles(docs):
    by_host = defaultdict(set)
    for i, r in docs.items():
        w = r["text"].lower().split(" ")
        for j in range(len(w) - _MIRROR_SHINGLE + 1):
            sh = " ".join(w[j : j + _MIRROR_SHINGLE])
            by_host[f"h{i % _MIRROR_HOSTS}"].add(
                hashlib.md5(sh.encode()).hexdigest()
            )
    return by_host


def test_mirror_pairs_match_pure_python_recompute(spark):
    docs = _docs(spark)
    by_host = _host_shingles(docs)
    host_df = Counter(fp for fps in by_host.values() for fp in fps)
    rare = {
        h: {fp for fp in fps if host_df[fp] <= _MIRROR_DF_CAP}
        for h, fps in by_host.items()
    }
    hosts = sorted(rare)
    want = {}
    for ai, a in enumerate(hosts):
        for b in hosts[ai + 1 :]:
            shared = len(rare[a] & rare[b])
            if shared:
                want[(a, b)] = (shared, len(rare[a]), len(rare[b]))
    got = {
        (r["host_a"], r["host_b"]): (r["shared"], r["size_a"], r["size_b"])
        for r in q88_mirror_host_pairs(spark, SF).collect()
    }
    assert got == want
    for r in q88_mirror_host_pairs(spark, SF).collect():
        expect_j = r["shared"] / (r["size_a"] + r["size_b"] - r["shared"])
        assert abs(r["jaccard"] - expect_j) < 1e-12
        assert 0 < r["shared"] <= min(r["size_a"], r["size_b"])


def test_containment_algebra(spark):
    rows = q89_shingle_containment(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_b"] == r["doc_a"] + 1
        assert 0 <= r["inter"] <= min(r["n_a"], r["n_b"])
        assert abs(r["cont_a_in_b"] * r["n_a"] - r["inter"]) < 1e-6
        assert abs(r["cont_b_in_a"] * r["n_b"] - r["inter"]) < 1e-6
        assert 0.0 <= r["cont_a_in_b"] <= 1.0 and 0.0 <= r["cont_b_in_a"] <= 1.0


def test_sitemap_discovery_excludes_seen_and_matches_fanout(spark):
    docs = _docs(spark)
    nn = len(docs)
    seen = {
        f"https://h{i % _SITEMAP_HOSTS}.example/p/{i}" for i in docs
    }
    referrers = defaultdict(set)
    for i in docs:
        for j in range(1, _SITEMAP_FANOUT + 1):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
            tgt = int(h[:8], 16) % (2 * nn)
            referrers[f"https://h{tgt % _SITEMAP_HOSTS}.example/p/{tgt}"].add(i)
    want = {
        u: len(refs) for u, refs in referrers.items() if u not in seen
    }
    got = {
        r["url"]: r["n_referrers"]
        for r in q90_sitemap_discovery(spark, SF).collect()
    }
    assert got == want
    assert got, "fanout spans 2N ids so unseen targets must exist"
    assert not set(got) & seen


def test_cdx_offsets_chain_and_digests_verify(spark):
    docs = _docs(spark)
    rows = q91_cdx_offset_index(spark, SF).collect()
    assert len(rows) == len(docs)
    by_file = defaultdict(list)
    for r in rows:
        by_file[r["warc_file"]].append(r)
    for f, recs in by_file.items():
        recs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in recs:
            assert r["rec_offset"] == off
            d = docs[r["doc_id"]]
            rec = (
                f"WARC/1.0\r\nWARC-Target-URI: https://{d['source']}"
                f".example.com/d/{d['doc_id']}\r\nContent-Length: "
                f"{d['n_chars']}\r\n\r\n{d['text']}\r\n\r\n"
            )
            assert r["rec_len"] == len(rec)
            assert r["digest"] == hashlib.md5(rec.encode()).hexdigest()
            off += r["rec_len"]


def test_registrable_domain_longest_match_semantics(spark):
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        q92_registrable_domain_rollup,
    )

    rows = q92_registrable_domain_rollup(spark, SF).collect()
    assert rows
    by_sfx = defaultdict(list)
    for r in rows:
        by_sfx[r["public_suffix"]].append(r)
        # registrable domain = exactly one label + the suffix
        assert r["reg_domain"].endswith("." + r["public_suffix"])
        reg_label = r["reg_domain"][: -len(r["public_suffix"]) - 1]
        assert "." not in reg_label and reg_label
        assert 1 <= r["n_hosts"] and r["n_hosts"] <= 4  # apex + up to 3 subs
        assert r["n_urls"] >= r["n_hosts"]
    # longest match is load-bearing: co.uk / ac.uk / github.io / com.au
    # hosts must never resolve to the bare ccTLD suffix
    assert "uk" not in by_sfx and "io" not in by_sfx and "au" not in by_sfx
    for multi in ("co.uk", "ac.uk", "github.io", "com.au"):
        assert by_sfx[multi], f"no registrants under {multi}"
    # github.io subdomains are DIFFERENT registrants (public suffix),
    # so multiple d<k>.github.io registrable domains coexist
    assert len(by_sfx["github.io"]) > 1


def test_incremental_index_touches_only_affected_vocabulary(spark):
    """The delta machinery must carry unaffected champion rows verbatim
    and recompute only delta-touched terms; verified by recomputing the
    affected-term set in pure Python from the same snapshot recipe."""
    from webscraping_video_pipeline_spark.contract.index import (
        q93_incremental_index_update,
    )

    docs = _docs(spark)

    def postings(text):
        w = text.lower().split(" ")
        out = {}
        for t_ in w:
            out[t_] = out.get(t_, 0) + 1
        return out

    a = {i: r["text"] for i, r in docs.items() if i % 7 != 0}
    b = {
        i: (r["text"] + " v2" if i % 3 == 0 else r["text"])
        for i, r in docs.items()
        if i % 5 != 0
    }
    del_ids = {i for i in a if i not in b or b[i] != a[i]}
    ins_ids = {i for i in b if i not in a or b[i] != a[i]}
    affected = set()
    for i in del_ids:
        affected |= set(postings(a[i]))
    for i in ins_ids:
        affected |= set(postings(b[i]))
    # full snapshot-B vocabulary (what a rebuild would touch)
    vocab_b = set()
    for i in b:
        vocab_b |= set(postings(b[i]))
    assert affected and len(affected) <= len(vocab_b)
    rows = q93_incremental_index_update(spark, SF).collect()
    assert rows
    got_terms = {r["term"] for r in rows}
    # the output index covers the full B vocabulary (champions exist for
    # every term), affected or not
    assert got_terms == vocab_b
    # df/cf match an independent full recount on B
    df = Counter()
    cf = Counter()
    for i in b:
        for t_, n in postings(b[i]).items():
            df[t_] += 1
            cf[t_] += n
    for r in rows:
        assert r["df"] == df[r["term"]] and r["cf"] == cf[r["term"]]


def test_aimd_fold_matches_pure_python_replay(spark):
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        _AIMD_CEIL,
        _AIMD_FLOOR,
        _AIMD_HOSTS,
        _AIMD_INIT,
        _AIMD_STEP,
        q94_aimd_rate_control,
    )

    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    want = {}
    for r in ev:
        h = r["user_id"] % _AIMD_HOSTS
        rate, n, errs = want.get(h, (_AIMD_INIT, 0, 0))
        if r["event_type"] == "error":
            rate, errs = max(rate // 2, _AIMD_FLOOR), errs + 1
        else:
            rate = min(rate + _AIMD_STEP, _AIMD_CEIL)
        want[h] = (rate, n + 1, errs)
    got = {r["host"]: r for r in q94_aimd_rate_control(spark, SF).collect()}
    assert set(got) == set(want)
    for h, (rate, n, errs) in want.items():
        assert got[h]["rate_micro"] == rate
        assert got[h]["n_events"] == n and got[h]["n_errors"] == errs
        assert abs(got[h]["rate_rps"] - rate / 1e6) < 1e-12
