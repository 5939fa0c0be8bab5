"""Round-4 session-6 pins:

- q104's pointer-doubling redirect resolution equals a step-by-step
  Python walk on randomized functional graphs — exact hop counts for
  resolved chains, exactly-32-hop cursors for capped/cyclic ones — and
  the fixture output satisfies the structural invariants (resolved
  targets are terminal, unresolved rows sit at the 32-hop cap);
- q105's positional phrase intersection equals a naive Python substring
  scan over the tokenized fixture text;
- q106's capped co-occurrence lift satisfies the counting identities
  (c12 <= min(c1, c2), pairs ordered t1 < t2, lift_milli is the exact
  integer division) against a pure-Python recount.
"""

from __future__ import annotations

import random
import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from webscraping_video_pipeline_spark.contract.index import (  # noqa: E402
    _COOC_CAP,
    _COOC_MIN_PAIR,
    _PHRASES,
    q105_phrase_search,
    q106_term_cooccurrence_lift,
)
from webscraping_video_pipeline_spark.contract.resolve import (  # noqa: E402
    q104_redirect_resolution,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ q104
def _py_resolve(nxt: dict, node: int, cap: int = 32):
    """Step-by-step walk: nxt maps node -> successor; absent = terminal."""
    cur, hops = node, 0
    while cur in nxt and hops < cap:
        cur = nxt[cur]
        hops += 1
    return cur, hops, cur not in nxt


def _doubling_resolve(spark, nxt: dict, nodes: list):
    """Clone the q104 doubling loop over an explicit successor map."""
    rows = [
        (
            n,
            nxt.get(n, n),
            0 if n not in nxt else 1,
            n not in nxt or nxt[n] not in nxt,
        )
        for n in nodes
    ]
    st = spark.createDataFrame(rows, "r long, cur long, hops long, done boolean")
    for _ in range(5):
        m = st.select(
            F.col("r").alias("m_r"),
            F.col("cur").alias("m_cur"),
            F.col("hops").alias("m_hops"),
            F.col("done").alias("m_done"),
        )
        st = st.join(
            m, (F.col("cur") == F.col("m_r")) & ~F.col("done"), "left"
        ).select(
            "r",
            F.when(F.col("done"), F.col("cur")).otherwise(F.col("m_cur")).alias("cur"),
            F.when(F.col("done"), F.col("hops"))
            .otherwise(F.col("hops") + F.col("m_hops"))
            .alias("hops"),
            (F.col("done") | F.col("m_done")).alias("done"),
        )
    return {r.r: (r.cur, r.hops, r.done) for r in st.collect()}


def test_pointer_doubling_matches_python_walk_fuzz(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(8, 60)
        nodes = list(range(n))
        # ~70% of nodes redirect somewhere (chains, trees, cycles all arise)
        nxt = {
            i: rng.randrange(n)
            for i in nodes
            if rng.random() < 0.7 and rng.randrange(n) != i
        }
        nxt = {k: v for k, v in nxt.items() if v != k}  # no self-loops
        got = _doubling_resolve(spark, nxt, nodes)
        for node in nodes:
            want = _py_resolve(nxt, node)
            assert got[node] == want, f"trial {trial} node {node}: {got[node]} vs {want}"


def test_q104_fixture_structural_invariants(spark):
    rows = q104_redirect_resolution(spark, SF).collect()
    assert len(rows) > 0
    # rebuild the rank->terminal rule the synthetic graph uses
    nids = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT event_id % 4096 FROM '{SF}/events.parquet'"
        ).fetchall()
    )
    rank = {f"u{nid}": i for i, nid in enumerate(nids)}
    for r in rows:
        if r.resolved:
            assert rank[r.final_url] % 7 == 0, f"{r.url} resolved to non-terminal"
            assert 0 <= r.hops < 32 or (r.hops <= 32)
        else:
            assert r.hops == 32, f"unresolved {r.url} reported hops={r.hops}"
    # terminals resolve to themselves at hop 0
    for r in rows:
        if rank[r.url] % 7 == 0:
            assert r.resolved and r.hops == 0 and r.final_url == r.url


# ------------------------------------------------------------------ q105
def test_phrase_search_matches_python_scan(spark):
    got = {
        (r.phrase, r.doc_id): (r.n_hits, r.first_pos)
        for r in q105_phrase_search(spark, SF).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF}/documents.parquet'"
    ).fetchall()
    want_all: dict = {}
    for ph in _PHRASES:
        w1, w2 = ph.split(" ")
        per_doc = []
        for doc_id, text in docs:
            toks = text.split(" ")
            hits = [
                i + 1
                for i in range(len(toks) - 1)
                if toks[i] == w1 and toks[i + 1] == w2
            ]
            if hits:
                per_doc.append((doc_id, len(hits), hits[0]))
        per_doc.sort(key=lambda x: (-x[1], x[0]))
        for doc_id, n, first in per_doc[:10]:
            want_all[(ph, doc_id)] = (n, first)
    assert got == want_all


# ------------------------------------------------------------------ q106
def test_cooccurrence_lift_matches_python_recount(spark):
    rows = q106_term_cooccurrence_lift(spark, SF).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF}/documents.parquet'"
    ).fetchall()
    capped_sets = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        first = {}
        for i, tok in enumerate(toks):
            first.setdefault(tok, i)
        keep = sorted(first, key=lambda w: (first[w], w))[:_COOC_CAP]
        capped_sets[doc_id] = set(keep)
    n_docs = len(capped_sets)
    df = Counter(t for s in capped_sets.values() for t in s)
    c12 = Counter()
    for s in capped_sets.values():
        terms = sorted(s)
        for i, t1 in enumerate(terms):
            for t2 in terms[i + 1 :]:
                c12[(t1, t2)] += 1
    want = {
        (t1, t2): (c, df[t1], df[t2], (n_docs * c * 1000) // (df[t1] * df[t2]))
        for (t1, t2), c in c12.items()
        if c >= _COOC_MIN_PAIR
    }
    got = {(r.t1, r.t2): (r.c12, r.c1, r.c2, r.lift_milli) for r in rows}
    assert got == want
    for r in rows:
        assert r.t1 < r.t2
        assert r.c12 <= min(r.c1, r.c2)


# ------------------------------------------------------------------ q107
def test_ahash_decoder_matches_closed_form():
    """_ahash_bmp must reproduce, from the encoded bytes alone, the hash
    computed directly from the pixel formula — catches row-flip, channel
    swap, and padding bugs without Spark."""
    from webscraping_video_pipeline_spark.contract.similarity import (
        _ahash_bmp,
        _synth_bmp,
    )

    for doc_id in (0, 1, 2, 3, 7, 13, 101, 4096):
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        luma = {
            (x, y): sum(
                (doc_id * 7 + y * 13 + x * 5 + off) % 256 for off in (0, 11, 22)
            )
            for x in range(w)
            for y in range(h)
        }
        total, npx = sum(luma.values()), w * h
        want = 0
        for (x, y), v in luma.items():
            if v * npx > total:
                want |= 1 << (y * w + x)
        got = _ahash_bmp(_synth_bmp(doc_id))
        assert got == (w, h, want), f"doc {doc_id}: {got} vs {(w, h, want)}"


def test_q107_fixture_canonical_unique_per_group(spark):
    from webscraping_video_pipeline_spark.contract.similarity import (
        q107_image_ahash_dedup,
    )

    rows = q107_image_ahash_dedup(spark, SF).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault((r.width, r.height, r.ahash), []).append(r)
    for key, members in groups.items():
        assert all(m.dup_count == len(members) for m in members)
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].doc_id == min(m.doc_id for m in members)


# ------------------------------------------------------------------ q108
def test_kmv_bottomk_merge_property():
    """bottom-k(A union B) == bottom-k(bottom-k(A) union bottom-k(B)) —
    the associativity that lets per-partition sketches combine."""
    rng = random.Random(5)
    k = 16
    for _ in range(20):
        a = {rng.randrange(1 << 30) for _ in range(rng.randint(5, 200))}
        b = {rng.randrange(1 << 30) for _ in range(rng.randint(5, 200))}
        direct = sorted(a | b)[:k]
        merged = sorted(set(sorted(a)[:k]) | set(sorted(b)[:k]))[:k]
        assert direct == merged


def test_q108_estimates_near_exact(spark):
    """Deterministic fixture: KMV estimates must land near the exact
    counts (k=128 -> rse ~ 8.8%; 35% is >3 sigma and the fixture is
    fixed, so this either always passes or flags a real estimator bug)."""
    from webscraping_video_pipeline_spark.contract.monitor import (
        q108_kmv_snapshot_overlap,
    )

    r = q108_kmv_snapshot_overlap(spark, SF).collect()[0]
    assert r.k_eff > 0 and r.tau > 0 and 0 <= r.rho <= r.k_eff
    assert abs(r.union_est - r.exact_union) <= 0.35 * r.exact_union
    assert abs(r.inter_est - r.exact_inter) <= 0.35 * r.exact_union


# ------------------------------------------------------------------ q109
def _py_scd2(seq):
    """seq: list of (k, fp) observations sorted by k. Returns set of
    (fp, valid_from, valid_to, is_current) intervals."""
    out, run = [], None
    last_k = None
    for k, fp in seq:
        if run is None or fp != run[0] or last_k != k - 1:
            if run is not None:
                out.append(run)
            run = [fp, k, k]
        else:
            run[2] = k
        last_k = k
    if run is not None:
        out.append(run)
    kmax = 3
    return {(fp, lo, hi, hi == kmax) for fp, lo, hi in out}


def test_scd2_matches_python_islands_fuzz(spark):
    from pyspark.sql import Window

    rng = random.Random(77)
    for trial in range(4):
        rows = []
        seqs: dict = {}
        for doc in range(rng.randint(3, 12)):
            seq = []
            for k in range(4):
                if rng.random() < 0.75:
                    fp = f"fp{rng.randint(0, 2)}"
                    seq.append((k, fp))
                    rows.append((doc, k, fp))
            seqs[doc] = seq
        if not rows:
            continue
        obs = spark.createDataFrame(rows, "doc_id long, k long, fp string")
        w = Window.partitionBy("doc_id").orderBy("k")
        marked = obs.select(
            "doc_id", "k", "fp",
            F.when(
                F.lag("fp").over(w).isNull()
                | (F.lag("fp").over(w) != F.col("fp"))
                | (F.lag("k").over(w) != F.col("k") - 1),
                1,
            ).otherwise(0).alias("new_run"),
        )
        runs = marked.select(
            "doc_id", "k", "fp", F.sum("new_run").over(w).alias("run_id")
        )
        got_rows = runs.groupBy("doc_id", "fp", "run_id").agg(
            F.min("k").alias("valid_from"),
            F.max("k").alias("valid_to"),
            (F.max("k") == 3).alias("is_current"),
        ).collect()
        got: dict = {}
        for r in got_rows:
            got.setdefault(r.doc_id, set()).add(
                (r.fp, r.valid_from, r.valid_to, r.is_current)
            )
        for doc, seq in seqs.items():
            assert got.get(doc, set()) == _py_scd2(seq), f"trial {trial} doc {doc}"


def test_q109_fixture_intervals_disjoint(spark):
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        q109_page_history_scd2,
    )

    rows = q109_page_history_scd2(spark, SF).collect()
    per_doc: dict = {}
    for r in rows:
        assert r.valid_from <= r.valid_to
        assert r.is_current == (r.valid_to == 3)
        per_doc.setdefault(r.doc_id, []).append((r.valid_from, r.valid_to))
    for doc, ivs in per_doc.items():
        ivs.sort()
        for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
            assert b1 < a2, f"doc {doc} overlapping intervals"


# ------------------------------------------------------------------ q110
def test_kneser_ney_counts_match_python(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        _KN_MIN_COUNT,
        q110_kneser_ney_counts,
    )

    docs = duckdb.sql(
        f"SELECT lower(text) FROM '{SF}/documents.parquet'"
    ).fetchall()
    c2 = Counter()
    for (text,) in docs:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
    left_tot = Counter()
    n_follow = Counter()
    cont = Counter()
    for (a, b), c in c2.items():
        left_tot[a] += c
        n_follow[a] += 1
        cont[b] += 1
    want = {
        (a, b): (c, left_tot[a], n_follow[a], cont[b], max(1000 * c - 750, 0))
        for (a, b), c in c2.items()
        if c >= _KN_MIN_COUNT
    }
    got = {
        (r.w1, r.w2): (r.c, r.c1_tot, r.n_follow, r.n1p_cont, r.kn_num_milli)
        for r in q110_kneser_ney_counts(spark, SF).collect()
    }
    assert got == want


# ------------------------------------------------------------------ q111
def test_zipf_coverage_monotone_and_complete(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        q111_zipf_vocab_coverage,
    )

    rows = sorted(q111_zipf_vocab_coverage(spark, SF).collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.freq >= b.freq for a, b in zip(rows, rows[1:]))
    assert all(
        a.coverage_permille <= b.coverage_permille for a, b in zip(rows, rows[1:])
    )
    assert rows[-1].coverage_permille == 1000  # full vocab covers everything
    assert rows[-1].cum_freq == sum(r.freq for r in rows)


# ------------------------------------------------------------------ q112
def test_url_templates_match_python(spark):
    import re

    from webscraping_video_pipeline_spark.contract.resolve import (
        _TPL_MIN_URLS,
        q112_url_path_templates,
    )

    evs = duckdb.sql(f"SELECT event_id FROM '{SF}/events.parquet'").fetchall()
    urls = []
    for (e,) in evs:
        u = f"example.com/c{e % 5}/item/{e % 97}"
        if e % 4 == 0:
            u += f"/rev/{e % 13}"
        urls.append(u)
    agg: dict = {}
    for u in urls:
        tpl = re.sub(r"[0-9]+", "<n>", u)
        agg.setdefault(tpl, []).append(u)
    want = {
        tpl: (len(us), len(set(us)), min(us), len(us) >= _TPL_MIN_URLS)
        for tpl, us in agg.items()
    }
    got = {
        r.template: (r.n_urls, r.n_distinct, r.sample_url, r.is_family)
        for r in q112_url_path_templates(spark, SF).collect()
    }
    assert got == want
    for r in got.values():
        assert r[1] <= r[0]


# ------------------------------------------------------------------ q113
def test_range_boundaries_are_exact_order_statistics(spark):
    import hashlib

    from webscraping_video_pipeline_spark.contract.monitor import (
        _RP_SHARDS,
        q113_range_partition_boundaries,
    )

    evs = duckdb.sql(f"SELECT DISTINCT event_id % 8192 FROM '{SF}/events.parquet'").fetchall()
    hashes = sorted(
        {
            int(hashlib.md5(f"u{e}".encode()).hexdigest()[:12], 16)
            for (e,) in evs
        }
    )
    n = len(hashes)
    rows = sorted(
        q113_range_partition_boundaries(spark, SF).collect(),
        key=lambda r: r.shard_boundary_idx,
    )
    assert len(rows) == _RP_SHARDS - 1
    for r in rows:
        assert r.n_keys == n
        assert r.k_rank == (r.shard_boundary_idx * n) // _RP_SHARDS
        assert r.boundary_hash == hashes[r.k_rank - 1]
    # equi-depth: shard populations differ by at most 1
    bounds = [r.boundary_hash for r in rows]
    shard_sizes = []
    lo = 0
    for b in bounds:
        hi = sum(1 for h in hashes if h <= b)
        shard_sizes.append(hi - lo)
        lo = hi
    shard_sizes.append(n - lo)
    assert max(shard_sizes) - min(shard_sizes) <= 1


# ------------------------------------------------------------------ q114
def test_host_drift_matches_python(spark):
    from webscraping_video_pipeline_spark.contract.monitor import (
        _DRIFT_BUCKETS,
        _DRIFT_HOSTS,
        _DRIFT_PERMILLE,
        q114_host_content_drift,
    )

    evs = duckdb.sql(
        f"SELECT event_id, user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    cells: dict = {}
    for e, u in evs:
        host = f"h{u % _DRIFT_HOSTS}"
        cell = cells.setdefault(host, [[0] * _DRIFT_BUCKETS, [0] * _DRIFT_BUCKETS])
        cell[e % 2][(e // 2) % _DRIFT_BUCKETS] += 1
    want = {}
    for host, (ca, cb) in cells.items():
        na, nb = sum(ca), sum(cb)
        if na == 0 or nb == 0:
            continue
        l1x = sum(abs(ca[i] * nb - cb[i] * na) for i in range(_DRIFT_BUCKETS))
        dp = (500 * l1x) // (na * nb)
        want[host] = (na, nb, dp, dp >= _DRIFT_PERMILLE)
    got = {
        r.host: (r.na, r.nb, r.drift_permille, r.is_drifted)
        for r in q114_host_content_drift(spark, SF).collect()
    }
    assert got == want
    assert all(0 <= v[2] <= 1000 for v in got.values())


# ------------------------------------------------------------------ q115
def test_postings_compression_matches_python(spark):
    from webscraping_video_pipeline_spark.contract.index import (
        q115_postings_compression,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM '{SF}/documents.parquet'"
    ).fetchall()
    postings: dict = {}
    for doc_id, text in docs:
        for tok in set(text.split(" ")):
            postings.setdefault(tok, set()).add(doc_id)

    def vbytes(v):
        for i, lim in enumerate((128, 16384, 2097152, 268435456)):
            if v < lim:
                return i + 1
        return 5

    want = {}
    for term, ids in postings.items():
        ordered = sorted(ids)
        gaps = [ordered[0] - (-1)] + [
            b - a for a, b in zip(ordered, ordered[1:])
        ]
        vb = sum(vbytes(g) for g in gaps)
        want[term] = (len(ids), 8 * len(ids), vb, (1000 * vb) // (8 * len(ids)))
    got = {
        r.term: (r.df, r.raw_bytes, r.varint_bytes, r.compression_permille)
        for r in q115_postings_compression(spark, SF).collect()
    }
    assert got == want
    # dense posting lists must actually compress
    assert any(v[3] <= 250 for v in got.values())
