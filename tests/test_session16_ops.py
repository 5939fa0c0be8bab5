"""Session-16 operators against pure-Python recounts:

- q185 label-propagation communities: 3-round synchronous LPA recount
  over the same deterministic link graph (majority label, min tiebreak);
- q186 soft-dedup weights: integer identities + consistency with q50's
  certified clusters (same builder);
- q187 Heaps vocabulary growth: full curve recount (arrival ordinals,
  first occurrences, closed-form checkpoints, cumulative + ratios);
- q188 CCNet per-language terciles: ANSI-ntile recount on top of the
  session-3 pure-Python KN scorer (the q161 model bits);
- operators/ordinals.sharded_ordinal partition_by: bit-equality with the
  single-task PARTITION BY window it replaces, and backward-compat of
  the global path.
"""

from __future__ import annotations

import collections
import hashlib
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tests.test_round5_session3_ops import _py_kn_scores, _docs  # noqa: E402

SF = "/root/testdata/sf0.001"
_FANOUT = 3
_LPA_ITERS = 3


def _ntile(rank, total, k):
    m = total % k
    small = total // k
    big = small + 1
    if rank <= m * big:
        return (rank + small) // big
    return m + (rank - m * big + small - 1) // small


# ----------------------------------------------------------------- q185
def _py_lpa(n_docs: int):
    adj: dict = collections.defaultdict(set)
    for src in range(n_docs):
        for j in range(1, _FANOUT + 1):
            h = hashlib.md5(f"{src}:{j}".encode()).hexdigest()[:8]
            dst = int(h, 16) % n_docs
            if dst != src:
                adj[src].add(dst)
                adj[dst].add(src)
    lab = {u: u for u in adj}
    for _ in range(_LPA_ITERS):
        new = {}
        for u, nbrs in adj.items():
            cnt: collections.Counter = collections.Counter(lab[v] for v in nbrs)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[u] = best
        lab = new
    community = {d: lab.get(d, d) for d in range(n_docs)}
    sizes = collections.Counter(community.values())
    return {d: (c, sizes[c]) for d, c in community.items()}


def test_q185_matches_bruteforce_lpa(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q185_label_propagation_communities,
    )

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    want = _py_lpa(n)
    got = {
        r.doc_id: (r.community, r.community_size)
        for r in q185_label_propagation_communities(spark, SF).collect()
    }
    assert got == want


def test_q185_fixture_is_discriminating(spark):
    from webscraping_video_pipeline_spark.contract.graph import (
        q185_label_propagation_communities,
    )

    rows = q185_label_propagation_communities(spark, SF).collect()
    doc_ids = {r.doc_id for r in rows}
    # labels name a canonical member, so every community id is a real doc
    assert {r.community for r in rows} <= doc_ids
    # propagation actually merged something AND did not collapse to one blob
    sizes = {r.community: r.community_size for r in rows}
    assert max(sizes.values()) > 1
    assert len(sizes) > 1
    assert sum(sizes.values()) == len(rows)


# ----------------------------------------------------------------- q186
def test_q186_weight_identities_and_q50_consistency(spark):
    from webscraping_video_pipeline_spark.contract.text import (
        q186_soft_dedup_weights,
        q50_lsh_dedup_pipeline,
    )

    rows = q186_soft_dedup_weights(spark, SF).collect()
    cc = {r.doc_id: (r.cluster_id, r.is_keeper) for r in q50_lsh_dedup_pipeline(spark, SF).collect()}
    toks = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert {r.doc_id for r in rows} == set(cc)
    sizes = collections.Counter(c for c, _ in cc.values())
    for r in rows:
        assert r.cluster_id == cc[r.doc_id][0]
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.n_tokens == toks[r.doc_id]
        assert r.weight_micro == 1_000_000 // r.cluster_size
        assert r.eff_tokens_micro == (1_000_000 * r.n_tokens) // r.cluster_size
        assert r.hard_kept_tokens == (toks[r.doc_id] if cc[r.doc_id][1] else 0)
    # soft mass is bounded by hard-kept mass only per-degenerate corpus;
    # globally: every cluster contributes ~avg tokens soft vs keeper hard
    assert any(r.cluster_size > 1 for r in rows), "fixture must have dup clusters"
    # soft weighting conserves unit mass per cluster up to floor loss
    per_cluster = collections.defaultdict(int)
    for r in rows:
        per_cluster[r.cluster_id] += r.weight_micro
    for cid, s in per_cluster.items():
        assert 1_000_000 - sizes[cid] < s <= 1_000_000


# ----------------------------------------------------------------- q187
def _py_heaps(docs):
    order = sorted(d for d, _ in docs)
    ordinal = {d: i + 1 for i, d in enumerate(order)}
    n = len(order)
    texts = dict(docs)
    tk = {d: len([w for w in texts[d].lower().split(" ") if w]) for d in order}
    first = {}
    for d in order:
        for w in texts[d].lower().split(" "):
            if w and (w not in first or ordinal[d] < first[w]):
                first[w] = min(first.get(w, 10**18), ordinal[d])
    kd = collections.Counter()
    for d in order:
        kd[(10 * ordinal[d] + n - 1) // n] += tk[d]
    kv = collections.Counter((10 * o + n - 1) // n for o in first.values())
    out = {}
    tcum = vcum = 0
    prev_t = prev_v = None
    for k in range(1, 11):
        tcum += kd.get(k, 0)
        vcum += kv.get(k, 0)
        tr = (1000 * tcum) // prev_t if prev_t else 0
        vr = (1000 * vcum) // prev_v if prev_v else 0
        out[k] = ((n * k) // 10, tcum, vcum, kv.get(k, 0), tr, vr)
        prev_t, prev_v = tcum, vcum
    return out


def test_q187_matches_python_curve(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        q187_heaps_vocab_growth,
    )

    want = _py_heaps(_docs(spark))
    got = {
        r.checkpoint: (
            r.docs_cum,
            r.tokens_cum,
            r.vocab_cum,
            r.new_vocab,
            r.tokens_ratio_permille,
            r.vocab_ratio_permille,
        )
        for r in q187_heaps_vocab_growth(spark, SF).collect()
    }
    assert got == want


def test_q187_curve_shape(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        q187_heaps_vocab_growth,
    )

    rows = sorted(
        q187_heaps_vocab_growth(spark, SF).collect(), key=lambda r: r.checkpoint
    )
    docs = _docs(spark)
    all_words = {
        w for _, text in docs for w in text.lower().split(" ") if w
    }
    n_tokens = sum(len([w for w in t.lower().split(" ") if w]) for _, t in docs)
    assert [r.checkpoint for r in rows] == list(range(1, 11))
    assert rows[-1].docs_cum == len(docs)
    assert rows[-1].vocab_cum == len(all_words)
    assert rows[-1].tokens_cum == n_tokens
    assert sum(r.new_vocab for r in rows) == len(all_words)
    for a, b in zip(rows, rows[1:]):
        assert b.docs_cum >= a.docs_cum
        assert b.tokens_cum >= a.tokens_cum
        assert b.vocab_cum >= a.vocab_cum
    # Heaps sublinearity on the fixture: vocabulary grows no faster than
    # tokens over the back half of the curve (new words get rarer)
    back = rows[5:]
    assert all(r.vocab_ratio_permille <= r.tokens_ratio_permille for r in back)


# ----------------------------------------------------------------- q188
def test_q188_matches_python_ntile(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        q188_ccnet_lang_terciles,
    )

    docs = _docs(spark)
    kn = _py_kn_scores(docs)  # doc_id -> (n_bg, bits, mean_millibits, band)
    lang = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    by_lang = collections.defaultdict(list)
    for d, (_nb, _b, mm, _band) in kn.items():
        by_lang[lang[d]].append((mm, d))
    want = {}
    for lg, items in by_lang.items():
        items.sort()
        total = len(items)
        for i, (mm, d) in enumerate(items):
            terc = _ntile(i + 1, total, 3)
            band = {1: "head", 2: "middle"}.get(terc, "tail")
            want[d] = (lg, kn[d][0], mm, terc, band)
    got = {
        r.doc_id: (r.lang, r.n_bigrams, r.mean_millibits, r.tercile, r.band)
        for r in q188_ccnet_lang_terciles(spark, SF).collect()
    }
    assert got == want


def test_q188_terciles_are_balanced_per_language(spark):
    from webscraping_video_pipeline_spark.contract.lm import (
        q188_ccnet_lang_terciles,
    )

    rows = q188_ccnet_lang_terciles(spark, SF).collect()
    per = collections.Counter((r.lang, r.tercile) for r in rows)
    langs = {r.lang for r in rows}
    assert len(langs) > 1, "fixture must be multilingual"
    for lg in langs:
        counts = [per.get((lg, k), 0) for k in (1, 2, 3)]
        assert max(counts) - min(counts) <= 1, (lg, counts)
    # the per-language head is NOT the corpus-wide head everywhere —
    # the whole point of banding per language
    assert {r.band for r in rows} == {"head", "middle", "tail"}


# ------------------------------------------------- ordinals partition_by
def test_sharded_ordinal_partition_by_matches_window(spark):
    from webscraping_video_pipeline_spark.operators.ordinals import (
        sharded_ordinal,
    )

    df = (
        spark.range(0, 997)
        .select(
            (F.col("id") % 7).alias("grp"),
            (F.xxhash64(F.col("id")) % 1000).alias("key"),
            F.col("id"),
        )
        .cache()
    )
    got = sharded_ordinal(
        df,
        [F.col("key"), F.col("id")],
        F.expr("key div 100"),
        out="rk",
        total="n",
        partition_by=["grp"],
    )
    w = Window.partitionBy("grp").orderBy("key", "id")
    want = df.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    g = {(r.grp, r.id): (r.rk, r.n) for r in got.collect()}
    e = {(r.grp, r.id): (r.rk, r.n) for r in want.collect()}
    assert g == e


def test_sharded_ordinal_global_path_unchanged(spark):
    from webscraping_video_pipeline_spark.operators.ordinals import (
        sharded_ordinal,
    )

    df = spark.range(0, 500).select(
        (F.xxhash64(F.col("id")) % 313).alias("key"), F.col("id")
    )
    got = sharded_ordinal(
        df, [F.col("key"), F.col("id")], F.expr("key div 50"), out="rk", total="n"
    )
    w = Window.orderBy("key", "id")
    want = df.withColumn("rk", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    assert {(r.id, r.rk, r.n) for r in got.collect()} == {
        (r.id, r.rk, r.n) for r in want.collect()
    }
