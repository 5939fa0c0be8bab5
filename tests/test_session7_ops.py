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
