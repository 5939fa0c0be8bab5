"""Round-5 session-3 operator pins (q161-q163) against pure-Python
recomputes on the sf0.001 fixture:

- q161 KN perplexity filter: the micro-fixed-point interpolated
  Kneser-Ney model and the per-doc integer-bit scores equal an
  independent pure-Python recompute (including the head/tail band);
- q162 seed BFS layers: the delta-frontier DataFrame loop equals a
  plain Python BFS over the same md5-derived edge set, and the fixture
  genuinely exercises multiple layers + unreachable nodes;
- q163 BPE encode: per-word token counts equal a pure-Python greedy
  encoder driven by the SAME merges test_round5_ops pins for q157, and
  every merge step is symbol-decreasing.
"""

from __future__ import annotations

import collections
import hashlib
import sys

sys.path.insert(0, "/root/repo")

from webscraping_video_pipeline_spark.contract.graph import (  # noqa: E402
    q162_seed_bfs_layers,
)
from webscraping_video_pipeline_spark.contract.lm import (  # noqa: E402
    q161_kn_perplexity_filter,
    q163_bpe_encode_tokens,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]


# ----------------------------------------------------------------- q161
def _flog2(x: int) -> int:
    return x.bit_length() - 1


def _py_kn_scores(docs):
    bg_by_doc = {}
    c2: collections.Counter = collections.Counter()
    for doc_id, text in docs:
        ws = text.lower().split(" ")
        bgs = list(zip(ws, ws[1:]))
        if bgs:
            bg_by_doc[doc_id] = bgs
            c2.update(bgs)
    left_tot: collections.Counter = collections.Counter()
    n_follow: collections.Counter = collections.Counter()
    cont: collections.Counter = collections.Counter()
    for (w1, w2), c in c2.items():
        left_tot[w1] += c
        n_follow[w1] += 1
        cont[w2] += 1
    n_types = len(c2)
    p_micro = {}
    for (w1, w2), c in c2.items():
        disc = (1000000 * max(1000 * c - 750, 0)) // (1000 * left_tot[w1])
        lam = (750000 * n_follow[w1]) // left_tot[w1]
        pc = (1000000 * cont[w2]) // n_types
        p_micro[(w1, w2)] = disc + (lam * pc) // 1000000
    per_doc = {}
    for doc_id, bgs in bg_by_doc.items():
        bits = [19 - _flog2(max(p_micro[b], 1)) for b in bgs]
        per_doc[doc_id] = (len(bits), sum(bits))
    s_bits = sum(v[1] for v in per_doc.values())
    s_bg = sum(v[0] for v in per_doc.values())
    return {
        doc_id: (
            n,
            b,
            (1000 * b) // n,
            "head" if b * s_bg < s_bits * n else "tail",
        )
        for doc_id, (n, b) in per_doc.items()
    }


def test_q161_matches_python(spark):
    want = _py_kn_scores(_docs(spark))
    got = {
        r.doc_id: (r.n_bigrams, r.bits_sum, r.mean_millibits, r.band)
        for r in q161_kn_perplexity_filter(spark, SF).collect()
    }
    assert got == want
    bands = {v[3] for v in got.values()}
    assert bands == {"head", "tail"}, "fixture should split into both bands"


# ----------------------------------------------------------------- q162
_SEED_MOD = 17
_FANOUT = 3
_ROUNDS = 3


def _py_edges(n_docs: int):
    adj: dict = collections.defaultdict(set)
    for src in range(n_docs):
        for j in range(1, _FANOUT + 1):
            h = hashlib.md5(f"{src}:{j}".encode()).hexdigest()[:8]
            dst = int(h, 16) % n_docs
            if dst != src:
                adj[src].add(dst)
    return adj


def _py_bfs(n_docs: int):
    adj = _py_edges(n_docs)
    dist = {d: 0 for d in range(n_docs) if d % _SEED_MOD == 0}
    frontier = set(dist)
    for i in range(1, _ROUNDS + 1):
        nxt = set()
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = i
                    nxt.add(v)
        frontier = nxt
    return {d: dist.get(d, -1) for d in range(n_docs)}


def test_q162_matches_python(spark):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    want = _py_bfs(n_docs)
    got = {r.doc_id: r.dist for r in q162_seed_bfs_layers(spark, SF).collect()}
    assert got == want
    hist = collections.Counter(got.values())
    # the fixture must exercise every layer AND leave something unreached
    assert all(hist[d] > 0 for d in range(_ROUNDS + 1)), hist
    assert hist[-1] > 0, "every node reached in 3 rounds: fixture degenerate"


# ----------------------------------------------------------------- q163
def _py_bpe_encode(texts, n_merges=3):
    words: collections.Counter = collections.Counter()
    for txt in texts:
        for w in txt.lower().split(" "):
            if w:
                words[w] += 1
    vocab = {w: tuple(list(w) + ["</w>"]) for w in words}
    for _step in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            f = words[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        (s1, s2), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        new = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        vocab = new
    return {w: (words[w], len(syms)) for w, syms in vocab.items()}


def test_q163_matches_python(spark):
    texts = [t for _d, t in _docs(spark)]
    want = {
        w: (f, n, len(w) + 1, len(w) + 1 - n, f * n)
        for w, (f, n) in _py_bpe_encode(texts).items()
    }
    got = {
        r.word: (r.freq, r.n_tokens, r.n_base, r.merged_away, r.tok_total)
        for r in q163_bpe_encode_tokens(spark, SF).collect()
    }
    assert got == want
    # the trained merges must actually fire on the fixture
    assert any(r[3] > 0 for r in got.values()), "no word was ever merged"


def test_q163_merges_are_symbol_decreasing(spark):
    rows = q163_bpe_encode_tokens(spark, SF).collect()
    assert all(1 <= r.n_tokens <= r.n_base for r in rows)
    # corpus-weighted totals: encoding must save exactly sum(freq) symbols
    # per merge occurrence; with 3 merges the saving is > 0 and bounded by
    # 3 * total_tokens (each merge removes at most one symbol per word occurrence)
    total_base = sum(r.freq * r.n_base for r in rows)
    total_tok = sum(r.tok_total for r in rows)
    total_words = sum(r.freq for r in rows)
    assert 0 < total_base - total_tok <= 3 * total_words


# ----------------------------------------------------------------- q164
from webscraping_video_pipeline_spark.contract.quality import (  # noqa: E402
    _CDC_D,
    _CDC_M,
    _CDC_PK,
    _CDC_W,
    q164_cdc_chunk_dedup,
)


def _py_cdc_chunks(tx: str):
    n = len(tx)
    if n == 0:
        return []
    bpos = [
        i
        for i in range(_CDC_W, n + 1)
        if (sum(ord(tx[i - 1 - k]) * _CDC_PK[k] for k in range(_CDC_W)) % _CDC_M)
        % _CDC_D
        == _CDC_D - 1
    ]
    if not bpos or bpos[-1] != n:
        bpos.append(n)
    out, prev = [], 0
    for b in bpos:
        out.append(tx[prev:b])
        prev = b
    return out


def _py_cdc_dedup(docs):
    seen: set = set()
    res = {}
    for doc_id, tx in sorted(docs):
        if not tx:
            continue
        chunks = _py_cdc_chunks(tx)
        kept, dropped = [], 0
        for c in chunks:
            if c in seen:
                dropped += 1
            else:
                seen.add(c)
                kept.append(c)
        res[doc_id] = (len(chunks), dropped, "".join(kept))
    return res


def test_q164_matches_python(spark):
    want = _py_cdc_dedup(_docs(spark))
    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in q164_cdc_chunk_dedup(spark, SF).collect()
    }
    assert got == want


def test_q164_planted_duplicates(spark, tmp_path):
    # the sf0.001 fixture has no cross-doc repeated ~16-char chunks, so
    # plant some: doc 1 embeds doc 0's text verbatim behind a prefix —
    # CDC must drop the shared chunks from doc 1 (boundaries resync) and
    # Spark must agree with the pure-Python dedup on counts AND text
    shared = " ".join(f"segment {i:04d} of the shared passage" for i in range(30))
    docs = [
        (0, shared),
        (1, "A FRESH LEAD PARAGRAPH BEFORE THE COPY. " + shared),
        (2, "entirely unrelated third document body with its own words"),
    ]
    d = tmp_path / "planted"
    d.mkdir()
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.cleaned_text)
        for r in q164_cdc_chunk_dedup(spark, str(d)).collect()
    }
    assert got == _py_cdc_dedup(docs)
    # doc 1 loses the chunks doc 0 already claimed (cross-doc dedup)...
    assert got[1][1] > len(_py_cdc_chunks(shared)) // 2
    # ...while the unrelated doc keeps everything
    assert got[2][1] == 0 and got[2][2] == docs[2][1]


def test_q164_boundaries_resynchronize_after_insertion():
    # the CDC property q64's fixed grid lacks: prepend text to a document
    # and all but the first few chunks are IDENTICAL again — boundaries
    # depend on a sliding 8-char window, so the grids realign within one
    # window past the edit (unique hash words so every chunk is distinct
    # and set comparison is exact)
    base = " ".join(hashlib.md5(str(i).encode()).hexdigest() for i in range(60))
    edited = "INSERTED PREFIX " + base
    a, b = _py_cdc_chunks(base), _py_cdc_chunks(edited)
    assert len(a) > 20, "fixture text must split into many chunks"
    shared = set(a) & set(b)
    assert len(shared) >= len(a) - 2, (len(a), len(b), len(shared))
    # fixed-size chunking (q64's 3-word grid) shares almost nothing: the
    # 2-word prefix shifts every 3-word chunk off the grid
    wa, wb = base.split(" "), edited.split(" ")
    fixed_a = {" ".join(wa[i : i + 3]) for i in range(0, len(wa), 3)}
    fixed_b = {" ".join(wb[i : i + 3]) for i in range(0, len(wb), 3)}
    assert len(fixed_a & fixed_b) <= len(fixed_a) // 4


def test_q164_reconstruction_identity():
    # with dedup OFF (a single doc), chunks concatenate back to the text
    tx = "The quick brown fox jumps over the lazy dog repeatedly and often."
    assert "".join(_py_cdc_chunks(tx)) == tx
