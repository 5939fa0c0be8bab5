"""Round-4 session-7 pins:

- q116's frequency-weighted BPE pair counts equal a pure-Python recount
  over the same whitespace tokenization (vocab counter -> per-word
  adjacent char pairs incl. the (last_char, '</w>') sentinel, weighted
  by corpus frequency), top-10 with the total (cnt desc, s1, s2)
  tiebreak;
- q117's integer max-normalized HITS equals a pure-Python mirror of the
  same two mutual-reinforcement iterations over the reconstructed
  md5-derived link graph, and both score columns hit the 10^6 ceiling
  exactly at their argmax;
- q118's discovery-saturation curve equals a pure-Python recount of
  first-observation rounds, and satisfies the saturation invariants
  (cum_distinct is the running sum of n_new, round 0 is all-new,
  n_new <= n_seen).
"""

from __future__ import annotations

import hashlib
import sys
from collections import Counter, defaultdict

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.crawl_ops import (  # noqa: E402
    _DISC_ROUNDS,
    _DISC_URLS,
    q118_discovery_saturation,
)
from webscraping_video_pipeline_spark.contract.graph import (  # noqa: E402
    _PR_FANOUT,
    q117_hits_hub_authority,
)
from webscraping_video_pipeline_spark.contract.lm import (  # noqa: E402
    _BPE_TOPK,
    q116_bpe_pair_counts,
)

SF = "/root/testdata/sf0.001"
_SCALE = 1_000_000


# ------------------------------------------------------------------ q116
def _py_bpe_top(texts):
    vocab = Counter()
    for txt in texts:
        for w in (txt or "").lower().split(" "):
            if w:
                vocab[w] += 1
    pairs = Counter()
    for w, freq in vocab.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += freq
        pairs[(w[-1], "</w>")] += freq
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    return [
        (s1, s2, cnt, rk + 1)
        for rk, ((s1, s2), cnt) in enumerate(ranked[:_BPE_TOPK])
    ]


def test_bpe_pair_counts_match_python_recount(spark):
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("text")
        .collect()
    ]
    expect = _py_bpe_top(texts)
    got = [
        (r.s1, r.s2, r.cnt, r.rk)
        for r in q116_bpe_pair_counts(spark, SF).orderBy("rk").collect()
    ]
    assert got == expect


# ------------------------------------------------------------------ q117
def _py_link_graph(doc_ids):
    n = len(doc_ids)
    edges = set()
    for d in doc_ids:
        for j in range(1, _PR_FANOUT + 1):
            h = hashlib.md5(f"{d}:{j}".encode()).hexdigest()[:8]
            dst = int(h, 16) % n
            if dst != d:
                edges.add((d, dst))
    return edges


def _py_hits(doc_ids, edges):
    def half(prev, reverse):
        raw = defaultdict(int)
        for src, dst in edges:
            if reverse:  # authority: sum hub scores of in-links
                raw[dst] += prev.get(src, 0)
            else:  # hub: sum authority scores of out-links
                raw[src] += prev.get(dst, 0)
        m = max(raw.values())
        return {k: (_SCALE * v) // m for k, v in raw.items()}

    h = {d: _SCALE for d in doc_ids}
    a = half(h, True)
    h = half(a, False)
    a = half(h, True)
    h = half(a, False)
    return h, a


def test_hits_matches_python_mirror_and_hits_ceiling(spark):
    doc_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    assert doc_ids == list(range(len(doc_ids)))  # ids are dense 0..N-1
    edges = _py_link_graph(doc_ids)
    hub, auth = _py_hits(doc_ids, edges)
    got = {
        r.node: (r.hub_micro, r.auth_micro)
        for r in q117_hits_hub_authority(spark, SF).collect()
    }
    assert set(got) == set(doc_ids)
    for d in doc_ids:
        assert got[d] == (hub.get(d, 0), auth.get(d, 0))
    hubs = [v[0] for v in got.values()]
    auths = [v[1] for v in got.values()]
    assert max(hubs) == _SCALE and max(auths) == _SCALE
    assert all(0 <= v <= _SCALE for v in hubs + auths)


# ------------------------------------------------------------------ q118
def test_discovery_saturation_matches_python_recount(spark):
    eids = [
        r.event_id
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id")
        .collect()
    ]
    pairs = {(e % _DISC_ROUNDS, (e // _DISC_ROUNDS) % _DISC_URLS) for e in eids}
    first = {}
    for rnd, url in sorted(pairs):
        first.setdefault(url, rnd)
    seen = Counter(rnd for rnd, _ in pairs)
    new = Counter(first.values())
    rows = q118_discovery_saturation(spark, SF).orderBy("round").collect()
    cum = 0
    assert [r.round for r in rows] == sorted(seen)
    for r in rows:
        cum += new.get(r.round, 0)
        assert r.n_seen == seen[r.round]
        assert r.n_new == new.get(r.round, 0)
        assert r.cum_distinct == cum
        assert r.new_permille == (1000 * r.n_new) // r.n_seen
        assert r.n_new <= r.n_seen
    assert rows[0].n_new == rows[0].n_seen  # round 0: everything is new
    assert cum == len(first)


# ------------------------------------------------------------------ q119
def test_unigram_surprisal_matches_python_recount(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        q119_unigram_surprisal_filter,
    )

    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    vocab = Counter()
    per_doc = {}
    for r in rows:
        ws = [w for w in r.text.lower().split(" ") if w]
        per_doc[r.doc_id] = Counter(ws)
        vocab.update(ws)
    total = sum(vocab.values())

    def flog2(x):
        return x.bit_length() - 1

    expect = {}
    for d, wc in per_doc.items():
        n_tok = sum(wc.values())
        bits = sum(k * (flog2(total) - flog2(vocab[w])) for w, k in wc.items())
        expect[d] = (n_tok, bits)
    s_bits = sum(b for _, b in expect.values())
    s_tok = sum(n for n, _ in expect.values())
    got = {
        r.doc_id: (r.n_tokens, r.bits_sum, r.mean_millibits, r.band)
        for r in q119_unigram_surprisal_filter(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for d, (n_tok, bits) in expect.items():
        band = "head" if bits * s_tok < s_bits * n_tok else "tail"
        assert got[d] == (n_tok, bits, (1000 * bits) // n_tok, band)
    assert {b for *_, b in got.values()} == {"head", "tail"}  # non-trivial


# ------------------------------------------------------------------ q120
def test_repeated_substring_spans_match_python_recount(spark):
    from webscraping_video_pipeline_spark.contract.quality import (
        _RS_W,
        q120_repeated_substring_spans,
    )

    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    occ = defaultdict(list)  # window text -> [(doc, i)]
    for r in rows:
        ws = r.text.split(" ")
        for i in range(1, len(ws) - _RS_W + 2):
            occ[" ".join(ws[i - 1 : i - 1 + _RS_W])].append((r.doc_id, i))
    hits = defaultdict(list)
    for ps in occ.values():
        if len(ps) >= 2:
            for d, i in ps:
                hits[d].append(i)
    expect = set()
    for d, starts in hits.items():
        starts.sort()
        island, s0, prev, cnt = 0, starts[0], starts[0], 1
        for i in starts[1:]:
            if i > prev + _RS_W:
                expect.add((d, island, s0, prev + _RS_W - 1, prev + _RS_W - s0, cnt))
                island, s0, cnt = island + 1, i, 0
            prev = i
            cnt += 1
        expect.add((d, island, s0, prev + _RS_W - 1, prev + _RS_W - s0, cnt))
    got = {
        (r.doc_id, r.island - 1, r.span_start, r.span_end, r.span_len, r.n_dup_windows)
        for r in q120_repeated_substring_spans(spark, SF).collect()
    }
    assert got == expect
    # spans are maximal: per doc, consecutive spans are separated by > W
    by_doc = defaultdict(list)
    for d, _isl, s, e, ln, _c in got:
        assert ln == e - s + 1 >= _RS_W
        by_doc[d].append((s, e))
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1  # next span start clears the previous window


# ------------------------------------------------------------------ q121
def test_kcore_matches_python_peel_and_converges(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
        q121_kcore_linkfarm,
    )

    doc_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    und = set()
    for s, d in _py_link_graph(doc_ids):
        und.add((s, d))
        und.add((d, s))

    def peel_once(edges):
        deg = Counter(s for s, _ in edges)
        alive = {n for n, c in deg.items() if c >= _KCORE_K}
        return {(s, d) for s, d in edges if s in alive and d in alive}

    cur = und
    for _ in range(_KCORE_ROUNDS):
        cur = peel_once(cur)
    assert peel_once(cur) == cur  # fixed-R IS the fixpoint on this graph
    deg = Counter(s for s, _ in cur)
    got = {
        r.node: (r.core_deg, r.in_core)
        for r in q121_kcore_linkfarm(spark, SF).collect()
    }
    assert set(got) == set(doc_ids)
    for n in doc_ids:
        assert got[n] == (deg.get(n, 0), deg.get(n, 0) >= _KCORE_K)
    flags = {v for _, v in got.values()}
    assert flags == {True, False}  # core is non-trivial on this graph
