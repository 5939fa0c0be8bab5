"""Language-model corpus-prep operators (round 4, session 6): the count
tables a web-text corpus feeds into n-gram LM estimation and tokenizer /
vocabulary design — the reference stops at storing raw text per item
(enhanced_batch_processor.py:569-584); an LLM-data pipeline aggregates it:

- **q110 Kneser-Ney count tables**: bigram counts, left-context totals,
  and the continuation counts N1+(.w) (distinct left contexts per word)
  that make KN smoothing work (Kneser & Ney 1995; Chen & Goodman 1998 —
  public literature). The absolute-discount numerator is emitted as
  max(1000*c - 750, 0) — the standard d = 0.75 in MILLI units — so the
  whole table is BIGINT and bit-identical across engines (the repo-wide
  no-float-division rule).
- **q111 Zipf vocabulary coverage**: rank terms by corpus frequency and
  report, per rank, the cumulative token share in permille — the curve
  that decides vocabulary size ("the top-k types cover X% of tokens").
  Share is (1000 * cum) div total: integer division, no floats.

Scale shape: both are one or two map-side-combined groupBys over skinny
token keys. The bigram table is vocabulary-squared-sized at most and in
practice Zipf-sparse; at web scale it is hash-partitioned by w1 and the
continuation counts reuse the SAME (w1, w2) aggregate (one shuffle feeds
both outputs). q111's rank window runs over the VOCABULARY table (type
count, not token count) — at 10^7 types that is one modest sorted stage,
and the two-level prefix-sum (q68) is the documented swap-in beyond it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

# ------------------------------------------------------------------ q110
_KN_DISCOUNT_MILLI = 750  # d = 0.75, the Chen-Goodman default
_KN_MIN_COUNT = 3  # emit bigrams seen >= 3 times

_KN_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
bg AS (SELECT ws[j] AS w1, ws[j + 1] AS w2
       FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS j) _),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
       FROM bg GROUP BY w1, w2),
left_tot AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1_tot,
                    CAST(COUNT(*) AS BIGINT) AS n_follow
             FROM c2 GROUP BY w1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_cont
         FROM c2 GROUP BY w2)
SELECT c2.w1, c2.w2, c2.c,
       l.c1_tot, l.n_follow, ct.n1p_cont,
       GREATEST(1000 * c2.c - {_KN_DISCOUNT_MILLI}, 0) AS kn_num_milli
FROM c2
JOIN left_tot l ON l.w1 = c2.w1
JOIN cont ct ON ct.w2 = c2.w2
WHERE c2.c >= {_KN_MIN_COUNT}
"""


@query("q110_kneser_ney_counts", oracle=_KN_ORACLE)
def q110_kneser_ney_counts(spark, sf_dir):
    """Kneser-Ney bigram count tables: per bigram (w1, w2) its count c,
    the left-context total c(w1 .), the fan-out N1+(w1 .) (distinct
    successors of w1), the continuation count N1+(. w2) (distinct
    predecessors of w2 — the quantity that makes KN-smoothed unigrams
    model "how many contexts license this word" instead of raw
    frequency), and the absolute-discount numerator
    max(1000*c - 750, 0) in milli units (d = 0.75).

    Scale shape: ONE corpus-sized shuffle — the (w1, w2) groupBy, map-
    side combined so each partition emits at most its local bigram-type
    count. left_tot, fan-out, and continuation counts are all derived
    from that SAME aggregated table (vocabulary-sized, Zipf-sparse),
    re-keyed by w1 or w2 — shuffles of type counts, never of tokens.
    All-BIGINT output; the discount lives in milli so no float ever
    appears. Reference analog: none — the reference stores text verbatim;
    this is the aggregation layer an LM-data product adds on top.
    """
    d = t(spark, sf_dir, "documents").select(
        F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    bg = d.select(
        F.posexplode("ws").alias("j", "w1"),
        F.col("ws").alias("ws"),
    ).select(
        "w1", F.expr("get(ws, j + 1)").alias("w2")
    ).filter(F.col("w2").isNotNull())
    # staged (q157/q148 discipline): left_tot, cont and the final join all
    # read THIS aggregate — unstaged, each re-derivation re-scans the corpus
    # (audited 3 scans / 10 shuffles; staged, one corpus exchange feeds all)
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    left_tot = c2.groupBy("w1").agg(
        F.sum("c").alias("c1_tot"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_cont"))
    return (
        c2.filter(F.col("c") >= _KN_MIN_COUNT)
        .join(left_tot, "w1")
        .join(cont, "w2")
        .select(
            "w1",
            "w2",
            "c",
            "c1_tot",
            "n_follow",
            "n1p_cont",
            F.greatest(
                1000 * F.col("c") - _KN_DISCOUNT_MILLI, F.lit(0).cast("long")
            ).alias("kn_num_milli"),
        )
    )


# ------------------------------------------------------------------ q111
_ZIPF_ORACLE = """
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT ws[j] AS term
        FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM tf),
ranked AS (SELECT term, freq,
                  ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rnk,
                  SUM(freq) OVER (ORDER BY freq DESC, term ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum
           FROM tf)
SELECT CAST(r.rnk AS BIGINT) AS rnk, r.term, r.freq,
       CAST(r.cum AS BIGINT) AS cum_freq,
       (1000 * r.cum) // t.total AS coverage_permille
FROM ranked r CROSS JOIN tot t
"""


@query("q111_zipf_vocab_coverage", oracle=_ZIPF_ORACLE)
def q111_zipf_vocab_coverage(spark, sf_dir):
    """Zipf rank-frequency table with cumulative coverage: every term
    ranked by corpus frequency (total tiebreak: freq desc, term asc)
    with its running token share in permille — read off "vocab size k
    covers N permille of all tokens" directly, the curve tokenizer and
    vocabulary design starts from. coverage = (1000 * cum) div total:
    BIGINT end to end.

    Scale shape: one map-side-combined token groupBy (corpus-sized
    shuffle of skinny term keys), then rank + running token sum over the
    VOCABULARY table via ordinals.sharded_prefix_sum — the shard is the
    negated bit length of freq (monotone non-decreasing along freq DESC,
    the q146 idiom), so both the ordinal and the cumulative coverage run
    shard-parallel: no unpartitioned window even at 10^8-type vocabs.
    Reference analog: none (stores raw text); this is the vocab-design
    aggregate an LLM pipeline adds.
    """
    from ..operators.ordinals import sharded_prefix_sum

    d = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tf = d.groupBy("term").agg(F.count(F.lit(1)).alias("freq")).localCheckpoint(
        eager=False
    )
    tot = tf.agg(F.sum("freq").alias("total"))
    blen = F.length(F.conv(F.col("freq").cast("string"), 10, 2)).cast("long")
    ranked = sharded_prefix_sum(
        tf,
        [F.col("freq").desc(), F.col("term").asc()],
        -blen,
        F.col("freq"),
        out="cum_freq",
        ordinal="rnk",
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "term",
        "freq",
        "cum_freq",
        F.expr("(1000 * cum_freq) div total").alias("coverage_permille"),
    )


# ------------------------------------------------------------------ q116
_BPE_TOPK = 10

_BPE_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT ws[j] AS word
        FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM tok WHERE len(word) > 0 GROUP BY word),
pairs AS (
  SELECT CASE WHEN i < len(word) THEN substr(word, i, 1)
              ELSE substr(word, len(word), 1) END AS s1,
         CASE WHEN i < len(word) THEN substr(word, i + 1, 1)
              ELSE '</w>' END AS s2,
         freq
  FROM vocab, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) _
  WHERE len(word) >= 1),
agg AS (SELECT s1, s2, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM pairs GROUP BY s1, s2)
SELECT s1, s2, cnt, CAST(rk AS BIGINT) AS rk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, s1 ASC, s2 ASC) AS rk
      FROM agg)
WHERE rk <= {_BPE_TOPK}
"""


@query("q116_bpe_pair_counts", oracle=_BPE_ORACLE)
def q116_bpe_pair_counts(spark, sf_dir):
    """BPE merge-candidate counting — the hot inner loop of byte-pair-
    encoding tokenizer training (Sennrich, Haddow & Birch 2016 — public
    literature): count adjacent symbol pairs over the corpus WEIGHTED BY
    WORD FREQUENCY (every word contributes its pairs times its corpus
    count, including the end-of-word sentinel pair (last_char, </w>)),
    and rank the top merge candidates with a total (cnt desc, s1, s2)
    tiebreak — exactly the argmax the trainer would merge next.

    THE scale trick is doing this over the VOCABULARY table, not the
    corpus: one corpus-sized token groupBy compresses 10^12 tokens to
    10^7 distinct words with counts; pair explosion then runs over those
    distinct words only (sum of word lengths over the vocab — millions
    of rows, not trillions) and the (s1, s2) groupBy map-side combines
    to the symbol-alphabet square. Successive merge ITERATIONS rescan
    the vocab table, never the corpus — that asymmetry is why BPE
    training is feasible at all. All-BIGINT. Reference analog: none
    (stores raw text); this is tokenizer-prep the LLM pipeline adds.
    """
    d = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    vocab = (
        d.filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
    ).select(
        F.expr(
            "case when i < length(word) then substr(word, i, 1)"
            " else substr(word, length(word), 1) end"
        ).alias("s1"),
        F.expr(
            "case when i < length(word) then substr(word, i + 1, 1)"
            " else '</w>' end"
        ).alias("s2"),
        "freq",
    )
    agg = pairs.groupBy("s1", "s2").agg(F.sum("freq").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("s1").asc(), F.col("s2").asc())
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _BPE_TOPK)
        .select("s1", "s2", "cnt", "rk")
    )


# ------------------------------------------------------------------ q119
# floor(log2(x)) for positive BIGINT x, exactly, in both engines: the
# length of the base-2 digit string minus one. Not a transcendental —
# it is integer bit-length, bit-identical everywhere.
_FLOG2_SPARK = "(length(conv(cast({x} as string), 10, 2)) - 1)"
_FLOG2_DUCK = "(length(to_base({x}, 2)) - 1)"

_SURPRISAL_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT doc_id, ws[j] AS word
        FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _
        WHERE len(ws[j]) > 0),
wc AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS k
       FROM tok GROUP BY doc_id, word),
vocab AS (SELECT word, CAST(SUM(k) AS BIGINT) AS freq FROM wc GROUP BY word),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS n FROM vocab),
sv AS (SELECT word, freq,
              {_FLOG2_DUCK.format(x='tot.n')} - {_FLOG2_DUCK.format(x='freq')}
                AS bits
       FROM vocab CROSS JOIN tot),
doc AS (SELECT wc.doc_id,
               CAST(SUM(wc.k) AS BIGINT) AS n_tokens,
               CAST(SUM(wc.k * sv.bits) AS BIGINT) AS bits_sum
        FROM wc JOIN sv ON sv.word = wc.word GROUP BY wc.doc_id),
g AS (SELECT CAST(SUM(bits_sum) AS BIGINT) AS s_bits,
             CAST(SUM(n_tokens) AS BIGINT) AS s_tok FROM doc)
SELECT doc_id, n_tokens, bits_sum,
       (1000 * bits_sum) // n_tokens AS mean_millibits,
       CASE WHEN bits_sum * g.s_tok < g.s_bits * n_tokens
            THEN 'head' ELSE 'tail' END AS band
FROM doc CROSS JOIN g
"""


@query("q119_unigram_surprisal_filter", oracle=_SURPRISAL_ORACLE)
def q119_unigram_surprisal_filter(spark, sf_dir):
    """CCNet-style LM-surprisal quality banding (Wenzek et al. 2020 —
    public literature) with a unigram model and EXACT integer bits:
    token surprisal := floor_log2(total_tokens) - floor_log2(freq) —
    an integer bit-length difference, NOT a transcendental log, so both
    engines and every partitioning agree to the bit. Per doc: token
    count, summed surprisal bits, mean in millibits (integer division),
    and the CCNet-style band — 'head' (more-probable-than-corpus-mean
    text, the keep side) vs 'tail' — decided by the cross-multiplied
    EXACT comparison bits_sum * S_tok < S_bits * n_tokens (no rounding;
    BIGINT-safe while bits_sum * S_tok < 2^63, i.e. through ~10^12
    corpus tokens with ~10^5-bit docs; past that, promote the compare
    to decimal(38,0) — same plan).

    Scale shape: tokens collapse to per-doc word counts FIRST (one
    corpus-sized but map-side-combined groupBy), the vocabulary and its
    1-row total derive from those counts (skinny word-keyed rows), and
    the doc score is a pre-keyed wc⋈vocab join plus a doc-keyed rollup.
    The corpus mean is a 1-row broadcast. Nothing rescans raw text
    twice. Reference analog: none (stores raw text); this is the
    perplexity-filter stage every LLM corpus pipeline runs, with the
    n-gram LM swapped for the exactly-reproducible unigram bound.
    """
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # ONE-file scan (guide §2.5)
    ).select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).filter(F.length("word") > 0)
    # staged (q157/q148 discipline): vocab, the total, and the doc score
    # all derive from THIS frame — unstaged, the corpus is re-scanned and
    # re-exploded per derivation (audited 6 scans / 18 shuffles)
    wc = (
        d.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=False)
    )
    vocab = wc.groupBy("word").agg(F.sum("k").alias("freq"))
    tot = vocab.agg(F.sum("freq").alias("n"))
    sv = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        F.expr(
            _FLOG2_SPARK.format(x="n") + " - " + _FLOG2_SPARK.format(x="freq")
        ).cast("long").alias("bits"),
    )
    doc = (
        wc.join(sv, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.sum(F.col("k") * F.col("bits")).alias("bits_sum"),
        )
    )
    g = doc.agg(
        F.sum("bits_sum").alias("s_bits"), F.sum("n_tokens").alias("s_tok")
    )
    return doc.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "n_tokens",
        "bits_sum",
        F.expr("(1000 * bits_sum) div n_tokens").alias("mean_millibits"),
        F.when(
            F.col("bits_sum") * F.col("s_tok")
            < F.col("s_bits") * F.col("n_tokens"),
            F.lit("head"),
        ).otherwise(F.lit("tail")).alias("band"),
    )


# ------------------------------------------------------------------ q128
_CT_K = 20  # profile size (Cavnar-Trenkle use 300; 20 keeps the oracle light)

_CT_ORACLE = f"""
WITH d AS (SELECT doc_id, lang, lower(text) AS tx FROM documents),
tg AS (SELECT doc_id, lang, substr(tx, i, 3) AS tri
       FROM d, LATERAL (SELECT unnest(range(1, len(tx) - 1)) AS i) _),
train AS (SELECT lang, tri, CAST(COUNT(*) AS BIGINT) AS freq
          FROM tg WHERE doc_id % 5 <> 0 GROUP BY lang, tri),
lp AS (SELECT lang, tri, CAST(rk AS BIGINT) AS rk FROM (
         SELECT lang, tri, ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY freq DESC, tri ASC) AS rk FROM train)
       WHERE rk <= {_CT_K}),
docprof AS (SELECT doc_id, lang, tri, CAST(rk AS BIGINT) AS rk FROM (
              SELECT doc_id, lang, tri, COUNT(*) AS freq,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY COUNT(*) DESC, tri ASC) AS rk
              FROM tg WHERE doc_id % 5 = 0 GROUP BY doc_id, lang, tri)
            WHERE rk <= {_CT_K}),
langs AS (SELECT DISTINCT lang AS cand FROM documents),
dist AS (SELECT dp.doc_id, dp.lang, l.cand,
                CAST(SUM(CASE WHEN lp.rk IS NULL THEN {_CT_K}
                              ELSE abs(dp.rk - lp.rk) END) AS BIGINT) AS d
         FROM docprof dp CROSS JOIN langs l
              LEFT JOIN lp ON lp.lang = l.cand AND lp.tri = dp.tri
         GROUP BY dp.doc_id, dp.lang, l.cand),
best AS (SELECT doc_id, lang, cand, d,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY d ASC, cand ASC) AS rk
         FROM dist)
SELECT doc_id, lang, cand AS pred_lang, d AS dist,
       (cand = lang) AS correct
FROM best WHERE rk = 1
"""


@query("q128_trigram_langid_train", oracle=_CT_ORACLE)
def q128_trigram_langid_train(spark, sf_dir):
    """Trained n-gram language identification — Cavnar & Trenkle 1994
    ("N-Gram-Based Text Categorization" — public literature; the
    algorithm behind classic langid tools): TRAIN per-language
    character-trigram rank profiles on the corpus itself (docs with
    doc_id % 5 != 0), then classify the held-out docs by
    OUT-OF-PLACE distance — for each trigram in the doc's own top-20
    profile, |doc_rank - language_rank|, with a fixed max penalty when
    the language profile lacks the trigram; predicted language =
    argmin distance (total tiebreak: distance asc, lang asc). Unlike
    the q29 fixed-heuristic langid, this one LEARNS its profiles from
    the data — the train+apply pattern of a real pipeline, where the
    profile table is versioned alongside the corpus. All ranks and
    distances are BIGINT; no floats anywhere. (On the driver's
    synthetic fixture the lang LABELS are independent of the text —
    every doc draws from one shared word pool — so accuracy is chance
    BY CONSTRUCTION; what the oracle + replay test pin is the exact
    train/classify machinery, which is the transferable part.)

    Scale shape: the trigram explode is corpus-sized but collapses
    immediately into two map-side-combined aggregates — (lang, tri)
    training counts (vocabulary-sized; the per-lang top-20 window runs
    over ~|langs| skinny partitions) and (doc, tri) test counts whose
    top-20 window rides the doc_id partitioning. Classification joins
    the 20-row-per-doc profiles against a BROADCAST (langs x 20)
    profile table and argmins per doc — O(test docs x langs x 20)
    skinny rows, one doc-keyed exchange. Reference semantic: upgrades
    the reference's hand-rules (ai_content_validator.py:27-36 fixed
    patterns) to corpus-trained classification, the same
    rules->learned step as q58->q78."""
    # repartition: the ONE-file fixture scan is a single task, and the
    # corpus-sized trigram explode + map-side partial aggregation run
    # BEFORE the first exchange — spread them over every core (guide §2.5
    # unsplittable-input case; disappears on a many-file corpus)
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.lower(F.col("text")).alias("tx")
    ).repartition(spark.sparkContext.defaultParallelism)
    # length guard: sequence(1, 0) is DESCENDING in Spark, so a text
    # shorter than one trigram must contribute nothing (the oracle's
    # range(1, len-1) is empty there) — filter, don't explode
    tg = (
        d.filter(F.length("tx") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("tx") - 2)).alias("i"),
            "tx",
        )
        .select("doc_id", "lang", F.expr("substr(tx, i, 3)").alias("tri"))
    )
    train = (
        tg.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wl = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("tri").asc())
    lp = (
        train.withColumn("rk", F.row_number().over(wl).cast("long"))
        .filter(F.col("rk") <= _CT_K)
        .select(F.col("lang").alias("cand"), "tri", F.col("rk").alias("lrk"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("freq").desc(), F.col("tri").asc())
    docprof = (
        tg.filter(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", "lang", "tri")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("rk", F.row_number().over(wd).cast("long"))
        .filter(F.col("rk") <= _CT_K)
    )
    langs = d.select(F.col("lang").alias("cand")).distinct()
    dist = (
        docprof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lp), ["cand", "tri"], "left")
        .groupBy("doc_id", "lang", "cand")
        .agg(
            F.sum(
                F.when(F.col("lrk").isNull(), F.lit(_CT_K)).otherwise(
                    F.abs(F.col("rk") - F.col("lrk"))
                )
            )
            .cast("long")
            .alias("d")
        )
    )
    wb = Window.partitionBy("doc_id").orderBy(F.col("d").asc(), F.col("cand").asc())
    return (
        dist.withColumn("brk", F.row_number().over(wb))
        .filter(F.col("brk") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand").alias("pred_lang"),
            F.col("d").alias("dist"),
            (F.col("cand") == F.col("lang")).alias("correct"),
        )
    )


# ------------------------------------------------------------------ q157
# Symbol-string encoding for the BPE merge loop: each symbol is wrapped
# \x01sym\x02, so the merge "replace(\x01s1\x02\x01s2\x02 -> \x01s1s2\x02)"
# is a plain non-overlapping left-to-right string replace with IDENTICAL
# semantics in Spark, DuckDB and Python (no shared boundary characters, so
# 'aaa' merges to ('aa','a') in all three — the true greedy BPE pass).
_BPE_S1, _BPE_S2 = "\x01", "\x02"

_BPE_TRAIN_PAIRS = """
{p} AS (SELECT syms[i] AS s1, syms[i+1] AS s2, CAST(SUM(freq) AS BIGINT) AS cnt
   FROM (SELECT string_split(substr(s, 2, length(s)-2), chr(2)||chr(1)) AS syms,
                freq FROM {w}),
        LATERAL (SELECT unnest(range(1, len(syms))) AS i) _
   GROUP BY s1, s2)"""
_BPE_TRAIN_ARGMAX = """
{m} AS (SELECT s1, s2, cnt FROM
          (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, s1, s2) rn FROM {p})
        WHERE rn = 1)"""
_BPE_TRAIN_APPLY = """
{w2} AS (SELECT replace({w}.s,
                        chr(1)||{m}.s1||chr(2)||chr(1)||{m}.s2||chr(2),
                        chr(1)||{m}.s1||{m}.s2||chr(2)) AS s, freq
         FROM {w}, {m})"""

_BPE_TRAIN_ORACLE = (
    """
WITH tok AS (SELECT unnest(string_split(lower(text),' ')) AS word FROM documents),
vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM tok WHERE len(word) > 0 GROUP BY word),
w0 AS (SELECT chr(1) || array_to_string(
                list_transform(range(1, length(word)+1), i -> word[i])
                  || ['</w>'],
                chr(2)||chr(1)) || chr(2) AS s,
              freq FROM vocab),
"""
    + ",".join(
        _BPE_TRAIN_PAIRS.format(p=f"p{k}", w=f"w{k-1}")
        + ","
        + _BPE_TRAIN_ARGMAX.format(m=f"m{k}", p=f"p{k}")
        + ("," + _BPE_TRAIN_APPLY.format(w2=f"w{k}", w=f"w{k-1}", m=f"m{k}") if k < 3 else "")
        for k in (1, 2, 3)
    )
    + """
SELECT CAST(1 AS BIGINT) AS step, s1, s2, cnt FROM m1
UNION ALL SELECT 2, s1, s2, cnt FROM m2
UNION ALL SELECT 3, s1, s2, cnt FROM m3
"""
)


def _bpe_adjacent_pairs(w):
    """Vocab-weighted adjacent symbol-pair counts of a symbol-string
    frame (s string, freq long) -> (s1, s2, cnt)."""
    return (
        w.select(
            F.split(F.expr("substr(s, 2, length(s)-2)"), _BPE_S2 + _BPE_S1).alias(
                "syms"
            ),
            "freq",
        )
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms)-1),"
                    " i -> struct(syms[i-1] as s1, syms[i] as s2))"
                )
            ).alias("pr"),
            "freq",
        )
        .groupBy("pr.s1", "pr.s2")
        .agg(F.sum("freq").alias("cnt"))
    )


def _bpe_apply_merge(w, m):
    """Apply a 1-row merge frame (s1, s2) to every symbol string: the
    winning pair travels as a BROADCAST row (never collect()ed), and the
    replace is a codegen string op over the vocab frame."""
    return w.crossJoin(F.broadcast(m.select("s1", "s2"))).select(
        F.replace(
            F.col("s"),
            F.concat(
                F.lit(_BPE_S1), F.col("s1"), F.lit(_BPE_S2),
                F.lit(_BPE_S1), F.col("s2"), F.lit(_BPE_S2),
            ),
            F.concat(F.lit(_BPE_S1), F.col("s1"), F.col("s2"), F.lit(_BPE_S2)),
        ).alias("s"),
        "freq",
    )


@query("q157_bpe_merge_train", oracle=_BPE_TRAIN_ORACLE)
def q157_bpe_merge_train(spark, sf_dir, _capture=None):
    """BPE tokenizer TRAINING, three full unrolled merge iterations —
    q116 counts the merge candidates once; this runs the actual trainer
    loop (Sennrich, Haddow & Birch 2016): count vocab-weighted adjacent
    symbol pairs, pick the argmax with the total (cnt desc, s1, s2)
    tiebreak, REWRITE every word's symbol sequence with the merged
    token, and repeat — emitting the learned merge table (step, s1, s2,
    cnt), the artifact a tokenizer ships. Symbol sequences are encoded
    as \\x01sym\\x02 strings so the merge is ONE non-overlapping
    left-to-right string replace with identical semantics in Spark,
    DuckDB and Python ('aaa' -> ('aa','a'), the true greedy pass); the
    DuckDB oracle unrolls the same three iterations and matches the
    merge table bit-exactly, and tests/test_round5_ops.py pins all
    three engines against a pure-Python BPE trainer.

    Scale shape (the q116 asymmetry, now through the whole loop): the
    ONE corpus-sized exchange is the initial word groupBy — 10^12
    tokens compress to a 10^7-row vocabulary — and every iteration
    after that rescans only the vocab frame: pair counts map-side
    combine to the symbol-alphabet square, the winner is a 1-row
    TakeOrderedAndProject broadcast (never a collect, never a driver
    loop over data), and the rewrite is a codegen string projection.
    Real trainers run ~50k merges with vocab in memory per executor;
    the per-iteration DATAFLOW is exactly this, checkpoint-staged every
    ~10^2 merges (the q80 discipline) to keep the lineage flat.

    Reference analog: none (the reference stores raw text per item —
    enhanced_batch_processor.py:569-584); tokenizer training is
    LLM-corpus prep this engine adds.
    """
    d = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    vocab = (
        d.filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = vocab.select(
        F.concat(
            F.lit(_BPE_S1),
            F.expr(
                "array_join(transform(sequence(1, length(word)),"
                f" i -> substr(word, i, 1)), '{_BPE_S2}{_BPE_S1}')"
            ),
            F.lit(_BPE_S2 + _BPE_S1 + "</w>" + _BPE_S2),
        ).alias("s"),
        "freq",
    )
    # Stage the symbol-string frame (the q80 checkpoint discipline): the
    # corpus is scanned ONCE to build the vocab; every merge iteration
    # after that reads the staged vocab-sized frame, never the corpus —
    # and each iteration re-stages so lineage stays flat at any merge
    # count (real trainers run ~50k). Pre-checkpoint stage plans are
    # audited via the ``_capture`` hook (q50 pattern).
    if _capture is not None:
        _capture["q157.vocab"] = w
    w = w.localCheckpoint(eager=False)
    merges = []
    for step in (1, 2, 3):
        m_pre = (
            _bpe_adjacent_pairs(w)
            .orderBy(F.col("cnt").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
        )
        if _capture is not None:
            _capture[f"q157.argmax{step}"] = m_pre
        m = m_pre.localCheckpoint(eager=False)
        merges.append(m.select(F.lit(step).cast("long").alias("step"), "s1", "s2", "cnt"))
        if step < 3:
            w_next = _bpe_apply_merge(w, m)
            if _capture is not None:
                _capture[f"q157.rewrite{step}"] = w_next
            w = w_next.localCheckpoint(eager=False)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out

# ------------------------------------------------------------------ q161
# Kneser-Ney smoothed bigram probability in MICRO fixed point: every
# term is an integer division both engines floor identically, so the
# model table — and everything scored with it — is bit-identical across
# engines and partitionings (the repo-wide no-float-division rule).
#   disc_micro = floor(1e6 * max(1000c - 750, 0) / (1000 * c1_tot))
#   lam_micro  = floor(750000 * n_follow / c1_tot)        (d = 0.75)
#   pcont_micro= floor(1e6 * n1p_cont / n_types)
#   p_micro    = disc_micro + floor(lam_micro * pcont_micro / 1e6)
# Each floor only loses mass, so p_micro <= 1e6 and the integer
# surprisal 19 - floor_log2(max(p_micro, 1)) lives in [0, 19] bits.
_KNP_D_MILLI = 750

_KNP_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
bg AS (SELECT doc_id, ws[j] AS w1, ws[j + 1] AS w2
       FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS j) _),
c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
left_tot AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1_tot,
                    CAST(COUNT(*) AS BIGINT) AS n_follow
             FROM c2 GROUP BY w1),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_cont FROM c2 GROUP BY w2),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c2),
model AS (
  SELECT c2.w1, c2.w2,
         (1000000 * GREATEST(1000 * c2.c - {_KNP_D_MILLI}, 0)) // (1000 * l.c1_tot)
         + (((750000 * l.n_follow) // l.c1_tot)
            * ((1000000 * ct.n1p_cont) // nt.n_types)) // 1000000 AS p_micro
  FROM c2 JOIN left_tot l ON l.w1 = c2.w1
          JOIN cont ct ON ct.w2 = c2.w2
          CROSS JOIN nt),
db AS (SELECT bg.doc_id,
              CAST(19 - ({_FLOG2_DUCK.format(x="GREATEST(m.p_micro, 1)")})
                   AS BIGINT) AS bits
       FROM bg JOIN model m ON m.w1 = bg.w1 AND m.w2 = bg.w2),
doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(bits) AS BIGINT) AS bits_sum
        FROM db GROUP BY doc_id),
g AS (SELECT CAST(SUM(bits_sum) AS BIGINT) AS s_bits,
             CAST(SUM(n_bigrams) AS BIGINT) AS s_bg FROM doc)
SELECT doc_id, n_bigrams, bits_sum,
       (1000 * bits_sum) // n_bigrams AS mean_millibits,
       CASE WHEN bits_sum * g.s_bg < g.s_bits * n_bigrams THEN 'head'
            ELSE 'tail' END AS band
FROM doc CROSS JOIN g
"""


def _kn_doc_bits(spark, sf_dir):
    """Shared KN-surprisal doc frame: (doc_id, n_bigrams, bits_sum) under
    the q161 interpolated Kneser-Ney bigram model (module-header MICRO
    fixed-point formula) — the builder q161 (corpus-mean banding) and
    q188 (per-language terciles) both score with, so their verdicts come
    from the IDENTICAL model bits."""
    # single-file scan -> 2 tasks; the bigram explode + model joins are
    # CPU-heavy integer work, so spread the scan first (guide §2.5)
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    bg = (
        d.select("doc_id", F.posexplode("ws").alias("j", "w1"), F.col("ws"))
        .select("doc_id", "w1", F.expr("get(ws, j + 1)").alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    # Stage the bigram-type aggregate (the q157/q148 discipline): the four
    # model tables below all derive from c2 — without staging, each
    # re-derivation re-scans and re-explodes the corpus (audited: 10 scans,
    # 22 shuffles; staged: 2 scans — model build + scoring pass — and the
    # scoring pass deliberately RESCANS the parquet rather than
    # checkpointing the corpus-sized bigram frame, which at 10^12 tokens
    # would cost more storage than the re-scan costs IO).
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    left_tot = c2.groupBy("w1").agg(
        F.sum("c").alias("c1_tot"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_cont"))
    nt = c2.agg(F.count(F.lit(1)).alias("n_types"))
    model = (
        c2.join(left_tot, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nt))
        .select(
            "w1",
            "w2",
            (
                F.expr(
                    f"(1000000 * greatest(1000 * c - {_KNP_D_MILLI}, 0))"
                    " div (1000 * c1_tot)"
                )
                + F.expr(
                    "(((750000 * n_follow) div c1_tot)"
                    " * ((1000000 * n1p_cont) div n_types)) div 1000000"
                )
            ).alias("p_micro"),
        )
    )
    db = bg.join(model, ["w1", "w2"]).select(
        "doc_id",
        (
            F.lit(19)
            - F.expr(_FLOG2_SPARK.format(x="greatest(p_micro, 1)"))
        ).cast("long").alias("bits"),
    )
    return db.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("bits").alias("bits_sum")
    )


@query("q161_kn_perplexity_filter", oracle=_KNP_ORACLE)
def q161_kn_perplexity_filter(spark, sf_dir):
    """CCNet-style perplexity quality banding with the REAL smoothed
    bigram LM the q110 count tables exist for — interpolated Kneser-Ney
    (Kneser & Ney 1995; Chen & Goodman 1998; public literature):
    p(w2|w1) = max(c - d, 0)/c(w1.) + (d * N1+(w1.)/c(w1.)) * N1+(.w2)/T,
    d = 0.75, all four factors in MICRO fixed point (module-header
    formula) so both engines floor identically. Per-bigram surprisal is
    the integer 19 - floor_log2(p_micro) bits (q119's exactly-
    reproducible-log idiom); per doc: bigram count, summed bits, mean in
    millibits, and the CCNet head/tail band versus the corpus mean via
    the cross-multiplied exact compare (q119). Upgrades q119's unigram
    bound to the context-conditioned model an actual perplexity filter
    runs — rare CONTINUATIONS now cost bits, not rare words.

    Scale shape: ONE corpus-sized exchange — the (w1, w2) bigram groupBy
    (map-side combined). left totals, continuation counts, and the type
    count all derive from that vocabulary-squared-sparse aggregate
    (skinny re-keys), and the scoring join hits the SAME (w1, w2) key
    the model table is already partitioned on — co-located, no second
    corpus shuffle shape. The 1-row type count and corpus mean are
    broadcasts. BIGINT end to end; headroom note: 1e6 * 1000c stays
    under 2^63 through c ~ 9×10^12 (a single bigram seen nine trillion
    times) — past that promote the numerator to decimal(38,0), same
    plan. Docs with fewer than two words have no bigrams and drop in
    both engines. Reference analog: none (stores raw text verbatim,
    enhanced_batch_processor.py:569-584); this is the LM-quality filter
    stage of an LLM corpus pipeline, trained on the corpus itself.
    """
    doc = _kn_doc_bits(spark, sf_dir)
    g = doc.agg(
        F.sum("bits_sum").alias("s_bits"), F.sum("n_bigrams").alias("s_bg")
    )
    return doc.crossJoin(F.broadcast(g)).select(
        "doc_id",
        "n_bigrams",
        "bits_sum",
        F.expr("(1000 * bits_sum) div n_bigrams").alias("mean_millibits"),
        F.when(
            F.col("bits_sum") * F.col("s_bg")
            < F.col("s_bits") * F.col("n_bigrams"),
            F.lit("head"),
        ).otherwise(F.lit("tail")).alias("band"),
    )

# ------------------------------------------------------------------ q163
# Word-carrying variant of the q157 apply CTE (the pair-count and argmax
# templates are reused verbatim — they project only (s, freq) and ignore
# the extra word column).
_BPE_ENC_APPLY = """
{w2} AS (SELECT word, replace({w}.s,
                        chr(1)||{m}.s1||chr(2)||chr(1)||{m}.s2||chr(2),
                        chr(1)||{m}.s1||{m}.s2||chr(2)) AS s, freq
         FROM {w}, {m})"""

_BPE_ENC_ORACLE = (
    """
WITH tok AS (SELECT unnest(string_split(lower(text),' ')) AS word FROM documents),
vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM tok WHERE len(word) > 0 GROUP BY word),
w0 AS (SELECT word, chr(1) || array_to_string(
                list_transform(range(1, length(word)+1), i -> word[i])
                  || ['</w>'],
                chr(2)||chr(1)) || chr(2) AS s,
              freq FROM vocab),
"""
    + ",".join(
        _BPE_TRAIN_PAIRS.format(p=f"p{k}", w=f"w{k-1}")
        + ","
        + _BPE_TRAIN_ARGMAX.format(m=f"m{k}", p=f"p{k}")
        + ","
        + _BPE_ENC_APPLY.format(w2=f"w{k}", w=f"w{k-1}", m=f"m{k}")
        for k in (1, 2, 3)
    )
    + """
SELECT word, freq,
       CAST(len(string_split(substr(s, 2, length(s)-2), chr(2)||chr(1)))
            AS BIGINT) AS n_tokens,
       CAST(length(word) + 1 AS BIGINT) AS n_base,
       CAST(length(word) + 1 AS BIGINT)
         - CAST(len(string_split(substr(s, 2, length(s)-2), chr(2)||chr(1)))
                AS BIGINT) AS merged_away,
       freq * CAST(len(string_split(substr(s, 2, length(s)-2), chr(2)||chr(1)))
                   AS BIGINT) AS tok_total
FROM w3
"""
)


@query("q163_bpe_encode_tokens", oracle=_BPE_ENC_ORACLE)
def q163_bpe_encode_tokens(spark, sf_dir, _capture=None):
    """BPE tokenizer APPLICATION — q157 trains the merge table; this is
    the other half a pipeline ships: ENCODE the vocabulary with the
    trained merges and emit the per-word token count, the base symbol
    count (chars + </w>), how many symbols the merges saved, and the
    corpus-weighted token total freq * n_tokens — the number that turns
    "document count" into the TOKEN budget every training-mix operator
    (q61/q71) actually allocates. Training is recomputed inline
    (identical dataflow to q157, same argmax tiebreak; the pair-count
    and argmax CTEs are shared code) and merge 3 is APPLIED too —
    training stops after picking it, encoding must rewrite with it.

    Scale shape: identical to q157 — ONE corpus-sized exchange (the
    word groupBy), then every merge iteration rescans only the staged
    vocab frame with a broadcast 1-row merge and a codegen string
    replace; the final token counts are a pure projection of that
    frame, zero additional shuffles. At a real 50k-merge vocabulary the
    encode is the same replace-loop applied ~50k times to a vocab-sized
    frame, checkpoint-staged every ~10^2 merges (q80 discipline), and
    serving-side encoding becomes a broadcast trie — the TRAINING-side
    dataflow is what this query pins. Reference analog: none (raw text
    verbatim, enhanced_batch_processor.py:569-584).
    """
    d = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    vocab = (
        d.filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = vocab.select(
        "word",
        F.concat(
            F.lit(_BPE_S1),
            F.expr(
                "array_join(transform(sequence(1, length(word)),"
                f" i -> substr(word, i, 1)), '{_BPE_S2}{_BPE_S1}')"
            ),
            F.lit(_BPE_S2 + _BPE_S1 + "</w>" + _BPE_S2),
        ).alias("s"),
        "freq",
    )
    if _capture is not None:
        _capture["q163.vocab"] = w
    w = w.localCheckpoint(eager=False)
    for step in (1, 2, 3):
        m = (
            _bpe_adjacent_pairs(w)
            .orderBy(F.col("cnt").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .localCheckpoint(eager=False)
        )
        w_next = w.crossJoin(F.broadcast(m.select("s1", "s2"))).select(
            "word",
            F.replace(
                F.col("s"),
                F.concat(
                    F.lit(_BPE_S1), F.col("s1"), F.lit(_BPE_S2),
                    F.lit(_BPE_S1), F.col("s2"), F.lit(_BPE_S2),
                ),
                F.concat(F.lit(_BPE_S1), F.col("s1"), F.col("s2"), F.lit(_BPE_S2)),
            ).alias("s"),
            "freq",
        )
        if _capture is not None:
            _capture[f"q163.rewrite{step}"] = w_next
        w = w_next.localCheckpoint(eager=False)
    n_tok = F.size(
        F.split(F.expr("substr(s, 2, length(s)-2)"), _BPE_S2 + _BPE_S1)
    ).cast("long")
    n_base = (F.length("word") + 1).cast("long")
    return w.select(
        "word",
        "freq",
        n_tok.alias("n_tokens"),
        n_base.alias("n_base"),
        (n_base - n_tok).alias("merged_away"),
        (F.col("freq") * n_tok).alias("tok_total"),
    )


# ------------------------------------------------------------------ q170
# Tokenizer fertility / fairness report: encode with the q157-trained
# merges and roll token economics up PER LANGUAGE — the parity audit
# (tokens per word, chars per token) multilingual-corpus releases run
# before fixing a tokenizer, since a language with high fertility pays
# more compute per character of content.
_FERT_ORACLE = (
    """
WITH tok AS (SELECT unnest(string_split(lower(text),' ')) AS word FROM documents),
vocab AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM tok WHERE len(word) > 0 GROUP BY word),
w0 AS (SELECT word, chr(1) || array_to_string(
                list_transform(range(1, length(word)+1), i -> word[i])
                  || ['</w>'],
                chr(2)||chr(1)) || chr(2) AS s,
              freq FROM vocab),
"""
    + ",".join(
        _BPE_TRAIN_PAIRS.format(p=f"p{k}", w=f"w{k-1}")
        + ","
        + _BPE_TRAIN_ARGMAX.format(m=f"m{k}", p=f"p{k}")
        + ","
        + _BPE_ENC_APPLY.format(w2=f"w{k}", w=f"w{k-1}", m=f"m{k}")
        for k in (1, 2, 3)
    )
    + """,
enc AS (SELECT word,
               CAST(len(string_split(substr(s, 2, length(s)-2), chr(2)||chr(1)))
                    AS BIGINT) AS n_tokens
        FROM w3),
lv AS (SELECT lang, x.word, CAST(COUNT(*) AS BIGINT) AS freq
       FROM (SELECT lang, unnest(string_split(lower(text),' ')) AS word
             FROM documents) x
       WHERE len(x.word) > 0 GROUP BY lang, x.word),
agg AS (SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_vocab_words,
               CAST(SUM(lv.freq) AS BIGINT) AS n_word_occurrences,
               CAST(SUM(lv.freq * enc.n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(lv.freq * CAST(length(lv.word) AS BIGINT)) AS BIGINT)
                 AS total_chars
        FROM lv JOIN enc ON enc.word = lv.word GROUP BY lang)
SELECT lang, n_vocab_words, n_word_occurrences, total_tokens, total_chars,
       (1000 * total_tokens) // n_word_occurrences AS fertility_millitokens,
       (1000 * total_chars) // total_tokens AS millichars_per_token
FROM agg
"""
)


@query("q170_tokenizer_fertility", oracle=_FERT_ORACLE)
def q170_tokenizer_fertility(spark, sf_dir, _capture=None):
    """Tokenizer fertility report per language: train the q157 BPE
    merges on the whole corpus, encode the vocabulary (the q163 path),
    and report per-language token economics — vocabulary size, word
    occurrences, total tokens, total characters, exact millitokens per
    word occurrence (fertility) and millichars per token. Fertility
    disparity across languages is the standard tokenizer-fairness
    finding (a high-fertility language consumes more sequence length
    per sentence), and this table is what decides whether the merge
    budget or the pre-tokenizer must change before a multilingual run.

    Scale shape: two corpus-sized exchanges TOTAL — the global word
    groupBy that training already pays (10^12 tokens -> 10^7 vocab
    rows) and one (lang, word) groupBy of the same width; every merge
    iteration rescans only the staged vocab frame (the q157/q163
    dataflow, _capture-audited pre-checkpoint), the word -> n_tokens
    encode table is vocab-sized and joins the (lang, word) counts on
    the SAME word key each was just aggregated on (AQE co-partitions),
    and the language rollup map-side combines to O(languages) rows.
    Verdict arithmetic is BIGINT permille — exact in both engines.

    Reference analog: none (the reference stores raw text per item);
    tokenizer parity auditing is LLM-corpus prep this engine adds."""
    d = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    )
    d = d.filter(F.length("word") > 0)
    vocab = d.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    w = vocab.select(
        "word",
        F.concat(
            F.lit(_BPE_S1),
            F.expr(
                "array_join(transform(sequence(1, length(word)),"
                f" i -> substr(word, i, 1)), '{_BPE_S2}{_BPE_S1}')"
            ),
            F.lit(_BPE_S2 + _BPE_S1 + "</w>" + _BPE_S2),
        ).alias("s"),
        "freq",
    )
    if _capture is not None:
        _capture["q170.vocab"] = w
    w = w.localCheckpoint(eager=False)
    for step in (1, 2, 3):
        m = (
            _bpe_adjacent_pairs(w)
            .orderBy(F.col("cnt").desc(), F.col("s1").asc(), F.col("s2").asc())
            .limit(1)
            .localCheckpoint(eager=False)
        )
        w_next = w.crossJoin(F.broadcast(m.select("s1", "s2"))).select(
            "word",
            F.replace(
                F.col("s"),
                F.concat(
                    F.lit(_BPE_S1), F.col("s1"), F.lit(_BPE_S2),
                    F.lit(_BPE_S1), F.col("s2"), F.lit(_BPE_S2),
                ),
                F.concat(F.lit(_BPE_S1), F.col("s1"), F.col("s2"), F.lit(_BPE_S2)),
            ).alias("s"),
            "freq",
        )
        if _capture is not None:
            _capture[f"q170.rewrite{step}"] = w_next
        w = w_next.localCheckpoint(eager=False)
    n_tok = F.expr(
        f"size(split(substr(s, 2, length(s)-2), '{_BPE_S2}{_BPE_S1}'))"
    ).cast("long")
    enc = w.select("word", n_tok.alias("n_tokens"))
    lv = d.groupBy("lang", "word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    agg = (
        lv.join(enc, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vocab_words"),
            F.sum("freq").cast("long").alias("n_word_occurrences"),
            F.sum(F.col("freq") * F.col("n_tokens")).cast("long").alias("total_tokens"),
            F.sum(F.col("freq") * F.length("word").cast("long"))
            .cast("long")
            .alias("total_chars"),
        )
    )
    return agg.select(
        "lang",
        "n_vocab_words",
        "n_word_occurrences",
        "total_tokens",
        "total_chars",
        F.expr("(1000 * total_tokens) div n_word_occurrences").alias(
            "fertility_millitokens"
        ),
        F.expr("(1000 * total_chars) div total_tokens").alias("millichars_per_token"),
    )


# ------------------------------------------------------------------ q187
# Heaps'-law vocabulary growth: V(T) ~ K * T^b (Heaps 1978; Baeza-Yates
# & Ribeiro-Neto). Checkpoint k covers the first floor(N*k/10) docs in
# arrival order; a doc with arrival ordinal `ord` belongs first to
# checkpoint ceil(10*ord/N) — exact integer form (10*ord + N - 1) div N,
# identical in both engines (floor((N*k)/10) >= ord  <=>  N*k >= 10*ord
# for integer ord, so the closed form needs no 10-way join).
_HEAPS_CKPTS = 10
_HEAPS_SHARD = 64  # arrival-ordinal shard block (production: ~10^6-row blocks)

_HEAPS_ORACLE = f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
rk AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS ord
       FROM documents),
w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
dt AS (SELECT doc_id,
              CAST(len(list_filter(ws, x -> len(x) > 0)) AS BIGINT) AS tk
       FROM w),
tok AS (SELECT doc_id, word
        FROM (SELECT doc_id, unnest(ws) AS word FROM w) WHERE len(word) > 0),
fo AS (SELECT t.word, MIN(r.ord) AS first_occ
       FROM tok t JOIN rk r USING (doc_id) GROUP BY t.word),
kv AS (SELECT ({_HEAPS_CKPTS} * first_occ + nn.n - 1) // nn.n AS k,
              CAST(COUNT(*) AS BIGINT) AS nv
       FROM fo CROSS JOIN nn GROUP BY 1),
kd AS (SELECT ({_HEAPS_CKPTS} * r.ord + nn.n - 1) // nn.n AS k,
              CAST(SUM(dt.tk) AS BIGINT) AS tks
       FROM rk r JOIN dt USING (doc_id) CROSS JOIN nn GROUP BY 1),
sp AS (SELECT k, (nn.n * k) // {_HEAPS_CKPTS} AS bound
       FROM nn CROSS JOIN (SELECT unnest(range(1, {_HEAPS_CKPTS} + 1)) AS k)),
agg AS (SELECT sp.k, sp.bound,
               COALESCE(kd.tks, 0) AS tks, COALESCE(kv.nv, 0) AS nv
        FROM sp LEFT JOIN kd USING (k) LEFT JOIN kv USING (k)),
cum AS (SELECT a.k, a.bound, a.nv,
               CAST(SUM(b.tks) AS BIGINT) AS tokens_cum,
               CAST(SUM(b.nv) AS BIGINT) AS vocab_cum
        FROM agg a JOIN agg b ON b.k <= a.k GROUP BY a.k, a.bound, a.nv)
SELECT c.k AS checkpoint, c.bound AS docs_cum, c.tokens_cum, c.vocab_cum,
       c.nv AS new_vocab,
       CAST(COALESCE((1000 * c.tokens_cum) // NULLIF(p.tokens_cum, 0), 0)
            AS BIGINT) AS tokens_ratio_permille,
       CAST(COALESCE((1000 * c.vocab_cum) // NULLIF(p.vocab_cum, 0), 0)
            AS BIGINT) AS vocab_ratio_permille
FROM cum c LEFT JOIN cum p ON p.k = c.k - 1
"""


@query("q187_heaps_vocab_growth", oracle=_HEAPS_ORACLE)
def q187_heaps_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary growth curve — cumulative distinct-term
    count and token count at 10 arrival-order checkpoints (Heaps 1978;
    Baeza-Yates & Ribeiro-Neto "Modern Information Retrieval" ch. 6:
    V(T) ~ K*T^b, b ~ 0.4-0.6 for web text). The capacity-planning dual
    of q111's Zipf coverage: Zipf says how often known words repeat,
    Heaps says how fast NEW words keep arriving — the curve that sizes
    a crawl's term dictionary, BPE vocab (q157), and stable-id space
    (q146) BEFORE the next 10x of corpus lands. Per checkpoint: docs,
    cumulative tokens, cumulative vocabulary, newly-seen vocabulary, and
    the checkpoint-over-checkpoint growth ratios in permille (the
    log-log slope's exact rational witness — the offline fit divides
    ln(vocab_ratio)/ln(tokens_ratio); the engine ships only integers).

    Scale shape: the arrival ordinal is operators/ordinals.py's
    sharded_ordinal (block shards of the arrival key — NO unpartitioned
    window); each term's FIRST-occurrence ordinal is one (word) groupBy
    MIN — the single corpus-sized exchange, map-side combined; both
    checkpoint assignments are the closed-form integer ceil above (zero
    joins), so the rollups are two skinny 10-row aggregates; cumulative
    sums and lag ratios run on the 10-row checkpoint spine via the
    triangular broadcast self-join (the ordinals-operator prefix idiom —
    never a window). Words through the first-occ aggregate carry ONE
    long each. Reference semantic: none — the reference counts files,
    never vocabulary (cloud_storage.py metrics); an LLM-corpus engine
    forecasts dictionary growth before committing token budgets."""
    from ..operators.ordinals import sharded_ordinal

    C = _HEAPS_CKPTS
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    nn = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = sharded_ordinal(
        d.select("doc_id"),
        [F.col("doc_id")],
        F.expr(f"doc_id div {_HEAPS_SHARD}"),
        out="ord",
    ).localCheckpoint(eager=False)  # read by the doc rollup AND the vocab pass
    dt = d.select(
        "doc_id",
        F.expr("cast(size(filter(ws, x -> length(x) > 0)) as long)").alias("tk"),
    )
    tok = d.select("doc_id", F.explode("ws").alias("word")).filter(
        F.length("word") > 0
    )
    fo = (
        tok.join(ranked, "doc_id")
        .groupBy("word")
        .agg(F.min("ord").alias("first_occ"))
    )
    kv = (
        fo.crossJoin(F.broadcast(nn))
        .groupBy(F.expr(f"({C} * first_occ + n - 1) div n").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    kd = (
        ranked.join(dt, "doc_id")
        .crossJoin(F.broadcast(nn))
        .groupBy(F.expr(f"({C} * ord + n - 1) div n").alias("k"))
        .agg(F.sum("tk").cast("long").alias("tks"))
    )
    sp = (
        nn.select(
            F.explode(F.array(*[F.lit(k) for k in range(1, C + 1)])).alias("k"),
            "n",
        )
        .select("k", F.expr(f"(n * k) div {C}").alias("bound"))
    )
    agg = (
        sp.join(kd, "k", "left")
        .join(kv, "k", "left")
        .select(
            "k",
            "bound",
            F.coalesce("tks", F.lit(0)).alias("tks"),
            F.coalesce("nv", F.lit(0)).alias("nv"),
        )
        .localCheckpoint(eager=False)  # 10 rows, self-joined twice below
    )
    lo = agg.select(
        F.col("k").alias("j"), F.col("tks").alias("jt"), F.col("nv").alias("jv")
    )
    cum = (
        agg.join(F.broadcast(lo), F.col("j") <= F.col("k"))
        .groupBy("k", "bound", "nv")
        .agg(
            F.sum("jt").cast("long").alias("tokens_cum"),
            F.sum("jv").cast("long").alias("vocab_cum"),
        )
    )
    prev = cum.select(
        (F.col("k") + 1).alias("k"),
        F.col("tokens_cum").alias("pt"),
        F.col("vocab_cum").alias("pv"),
    )
    return (
        cum.join(F.broadcast(prev), "k", "left")
        .select(
            F.col("k").alias("checkpoint"),
            F.col("bound").alias("docs_cum"),
            "tokens_cum",
            "vocab_cum",
            F.col("nv").alias("new_vocab"),
            F.when(F.col("pt") > 0, F.expr("(1000 * tokens_cum) div pt"))
            .otherwise(0)
            .cast("long")
            .alias("tokens_ratio_permille"),
            F.when(F.col("pv") > 0, F.expr("(1000 * vocab_cum) div pv"))
            .otherwise(0)
            .cast("long")
            .alias("vocab_ratio_permille"),
        )
    )


# ------------------------------------------------------------------ q188
_CCNET_BUCKETS = 3

_CCNET_TERCILE_ORACLE = f"""
WITH base AS ({_KNP_ORACLE}),
j AS (SELECT b.doc_id, d.lang, b.n_bigrams, b.mean_millibits
      FROM base b JOIN documents d USING (doc_id)),
r AS (SELECT doc_id, lang, n_bigrams, mean_millibits,
             CAST(ntile({_CCNET_BUCKETS}) OVER (
                    PARTITION BY lang
                    ORDER BY mean_millibits, doc_id) AS BIGINT) AS tercile
      FROM j)
SELECT doc_id, lang, n_bigrams, mean_millibits, tercile,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS band
FROM r
"""


@query("q188_ccnet_lang_terciles", oracle=_CCNET_TERCILE_ORACLE)
def q188_ccnet_lang_terciles(spark, sf_dir):
    """CCNet head/middle/tail perplexity terciles PER LANGUAGE — Wenzek
    et al. LREC 2020 (CCNet: the Common-Crawl curation pipeline behind
    CamemBERT/XLM-R corpora) buckets each language's documents into
    perplexity terciles under a language-model score and keeps the head
    (lowest-perplexity) band; q161 bands against ONE corpus-wide mean,
    which in a multilingual crawl just splits by language difficulty —
    this is the per-language banding an actual multilingual release
    ships. Scores are q161's exact KN bigram bits (SAME builder, so the
    corpus-mean band and the per-language tercile are two verdicts on
    identical millibits); tercile = ANSI NTILE(3) over (mean_millibits,
    doc_id) within each language, reproduced bit-exactly from the
    distributed rank by ordinals.ntile_expr.

    Scale shape: the rank is sharded_ordinal with partition_by=[lang] —
    per-language two-level prefix sums, shard = millibits div 1024
    (monotone along each language's order), so ENGLISH AT HALF THE WEB
    sorts shard-parallel instead of in one per-language task and the
    plan has no unpartitioned WindowExec; everything upstream rides
    q161's one-exchange model build. Docs with <2 words have no bigrams
    and drop in both engines (q161 semantics). Reference analog: none —
    the reference stores text verbatim; this is the multilingual
    quality-filter stage between lang-ID (q29/q128/q139) and the
    training mix (q61/q71)."""
    from ..operators.ordinals import ntile_expr, sharded_ordinal

    doc = _kn_doc_bits(spark, sf_dir)
    lang = t(spark, sf_dir, "documents").select("doc_id", "lang")
    j = doc.join(lang, "doc_id").select(
        "doc_id",
        "lang",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.expr("(1000 * bits_sum) div n_bigrams").alias("mean_millibits"),
    )
    ranked = sharded_ordinal(
        j,
        [F.col("mean_millibits"), F.col("doc_id")],
        F.expr("mean_millibits div 1024"),
        out="_rk",
        total="_n",
        partition_by=["lang"],
    )
    return (
        ranked.withColumn("tercile", ntile_expr("_rk", "_n", _CCNET_BUCKETS))
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "mean_millibits",
            "tercile",
            F.when(F.col("tercile") == 1, F.lit("head"))
            .when(F.col("tercile") == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("band"),
        )
    )
