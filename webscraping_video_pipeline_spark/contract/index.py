"""Index-build and index-query operators (round 4): the web-search-side
products a crawl's output feeds that no prior contract query built —
q83/q84 (session 2), q93 incremental maintenance (session 3), and the
query-time side q105 positional phrase search + q106 co-occurrence
lift (session 6) —

- **q83 inverted index with champion lists**: term -> (df, cf, top-k
  postings by term frequency) — the core search-index build over
  extracted text, with the postings truncated to per-term champion
  lists (the standard index-time top-k pruning; Manning,
  Raghavan & Schütze, Introduction to Information Retrieval).
- **q84 anchor-text aggregation**: per link-TARGET rollup of the
  anchor text carried by each in-link — the classic off-page relevance
  signal (anchor text describes the target better than the target
  does); link occurrences and anchors derive deterministically from
  ``documents`` exactly like q80's link graph.

Cross-engine determinism: counts are BIGINT, every ranking carries a
total tiebreak (term frequency desc, then doc_id asc; anchor count
desc, then anchor asc), no floating-point accumulation at all.

Reference semantic: the reference stores scraped metadata per video
(title/description/tags — its "anchor text") keyed by source id
(enhanced_batch_processor.py:569-584); a web-scale pipeline inverts the
extracted text and aggregates in-link anchors so ranking sees both.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

_CHAMPIONS = 3
_ANCHOR_FANOUT = 3


@query(
    "q83_inverted_index",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    p AS (SELECT doc_id, j, ws[j] AS term
          FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
    tf AS (SELECT term, doc_id,
                  CAST(COUNT(*) AS BIGINT) AS tf,
                  CAST(MIN(j) AS BIGINT) AS first_pos
           FROM p GROUP BY term, doc_id),
    stats AS (SELECT term,
                     CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(tf) AS BIGINT) AS cf
              FROM tf GROUP BY term),
    ranked AS (SELECT tf.*, ROW_NUMBER() OVER (PARTITION BY term
                               ORDER BY tf DESC, doc_id ASC) AS rk
               FROM tf)
    SELECT r.term, s.df, s.cf, r.doc_id, r.tf, r.first_pos,
           CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN stats s ON s.term = r.term
    WHERE r.rk <= {_CHAMPIONS}
    """,
)
def q83_inverted_index(spark, sf_dir):
    """Inverted-index build with champion lists: posting = (term, doc_id,
    tf, first_pos); per term keep document frequency, collection
    frequency, and only the top-3 (``_CHAMPIONS``) postings by (tf desc,
    doc_id asc) — index-time top-k pruning, so query-time top-k never
    touches the full posting list of a common term.

    Scale shape (plan-audited: 4 exchanges, but only the FIRST moves
    corpus-sized data): the (term, doc_id) tf aggregate is map-side
    combined, so each mapper ships its distinct (term, doc) pairs —
    never raw token occurrences; everything downstream (df/cf rollup,
    champion window, final join) exchanges term-level or champion-level
    rows, O(vocabulary) not O(tokens). The single-exchange alternative
    (repartition("term") first, letting term partitioning satisfy every
    later clustering) was rejected: it would push RAW token rows through
    the one exchange, trading three skinny shuffles for one corpus-fat
    one. Stopword terms skew the (term, doc_id) key far less than a
    term-only key would (doc_id spreads the hot term), and AQE
    skew-split covers the residue.

    Reference semantic: inverts what the reference stores as per-item
    searchable metadata (enhanced_batch_processor.py:569-584)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    p = d.select("doc_id", F.posexplode("ws").alias("j0", "term")).select(
        "doc_id", (F.col("j0") + 1).alias("j"), "term"
    )
    tf = p.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.min("j").cast("long").alias("first_pos")
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    ranked = tf.withColumn("rk", F.row_number().over(w).cast("long")).filter(
        F.col("rk") <= _CHAMPIONS
    )
    return ranked.join(stats, "term").select(
        "term", "df", "cf", "doc_id", "tf", "first_pos", "rk"
    )


# Link occurrences WITH their slot j (q80 dedupes to the edge set; the
# anchor index keeps one row per occurrence, because each carries its
# own anchor text), self-loops dropped. Anchor = the j-th and j+1-th
# words of the SOURCE document — a deterministic stand-in for the text
# inside the <a> tag.
_ANCHOR_ORACLE = f"""
    WITH n AS (SELECT COUNT(*) AS nn FROM documents),
    lk AS (
      SELECT src, dst, anchor FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst,
               string_split(lower(d.text), ' ')[u.j] || ' ' ||
               string_split(lower(d.text), ' ')[u.j + 1] AS anchor
        FROM documents d CROSS JOIN n
             CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    ac AS (SELECT dst, anchor, CAST(COUNT(*) AS BIGINT) AS n
           FROM lk GROUP BY dst, anchor),
    tot AS (SELECT dst,
                   CAST(SUM(n) AS BIGINT) AS n_inlinks,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_anchors
            FROM ac GROUP BY dst),
    top AS (SELECT dst, anchor, n,
                   ROW_NUMBER() OVER (PARTITION BY dst
                                      ORDER BY n DESC, anchor ASC) AS rk
            FROM ac)
    SELECT t.dst AS doc_id, t.n_inlinks, t.n_distinct_anchors,
           p.anchor AS top_anchor, p.n AS top_anchor_n
    FROM tot t JOIN top p ON p.dst = t.dst AND p.rk = 1
"""


@query("q84_anchor_text_index", oracle=_ANCHOR_ORACLE)
def q84_anchor_text_index(spark, sf_dir):
    """Anchor-text aggregation per link target: every in-link carries the
    anchor text its source wrote; the rollup gives each target its
    in-link count, distinct-anchor count, and modal anchor (count desc,
    anchor asc tiebreak) — the off-page text signal rankers weight above
    on-page text for navigational queries.

    Scale shape (plan-audited: 4 exchanges, only the first carries
    link-sized data): the (dst, anchor) count is map-side combined, so
    the heavy exchange ships distinct (dst, anchor) partials — never raw
    link occurrences; the target totals, modal-anchor window, and final
    join all move (dst, anchor)-level or dst-level rows. Mega-hub
    targets (every page links to the homepage) are THE skew case for
    anchor rollups: the (dst, anchor) pre-aggregate is what keeps it
    bounded — a hot target with 10^7 in-links but 10^3 distinct anchor
    strings shrinks to 10^3 rows before the dst-level merge, and AQE
    splits whatever residual skew remains.

    Reference semantic: the per-item metadata store
    (enhanced_batch_processor.py:569-584) inverted to the link graph's
    view of each target."""
    d = t(spark, sf_dir, "documents")
    n1 = d.agg(F.count(F.lit(1)).alias("nn"))
    ws = F.split(F.lower(F.col("text")), " ")
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("j").cast("string"))
    )
    lk = (
        d.select("doc_id", ws.alias("ws"))
        .crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            "nn",
            "ws",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, _ANCHOR_FANOUT + 1)])
            ).alias("j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.col("nn")).alias(
                "dst"
            ),
            F.concat(
                F.element_at("ws", F.col("j")),
                F.lit(" "),
                F.element_at("ws", F.col("j") + 1),
            ).alias("anchor"),
        )
        .filter(F.col("dst") != F.col("src"))
    )
    ac = lk.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("n"))
    tot = ac.groupBy("dst").agg(
        F.sum("n").alias("n_inlinks"),
        F.count(F.lit(1)).alias("n_distinct_anchors"),
    )
    w = Window.partitionBy("dst").orderBy(F.col("n").desc(), F.col("anchor").asc())
    top = ac.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return tot.join(top, "dst").select(
        F.col("dst").alias("doc_id"),
        "n_inlinks",
        "n_distinct_anchors",
        F.col("anchor").alias("top_anchor"),
        F.col("n").alias("top_anchor_n"),
    )


# ------------------------------------------------ incremental maintenance
_Q83_TF_SQL = """
    w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM docs2),
    p AS (SELECT doc_id, j, ws[j] AS term
          FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
    tf AS (SELECT term, doc_id,
                  CAST(COUNT(*) AS BIGINT) AS tf,
                  CAST(MIN(j) AS BIGINT) AS first_pos
           FROM p GROUP BY term, doc_id),
    stats AS (SELECT term,
                     CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(tf) AS BIGINT) AS cf
              FROM tf GROUP BY term),
    ranked AS (SELECT tf.*, ROW_NUMBER() OVER (PARTITION BY term
                               ORDER BY tf DESC, doc_id ASC) AS rk
               FROM tf)
"""


def _postings(docs):
    """q83's posting build: (term, doc_id, tf, first_pos), 1-based
    positions — shared by the old-index build and the delta insert."""
    return (
        docs.select(
            "doc_id", F.posexplode(F.split(F.lower(F.col("text")), " "))
        )
        .groupBy(F.col("col").alias("term"), F.col("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            (F.min("pos") + 1).cast("long").alias("first_pos"),
        )
    )


@query(
    "q93_incremental_index_update",
    oracle=f"""
    WITH docs2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 5 <> 0),
    {_Q83_TF_SQL}
    SELECT r.term, s.df, s.cf, r.doc_id, r.tf, r.first_pos,
           CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN stats s ON s.term = r.term
    WHERE r.rk <= {_CHAMPIONS}
    """,
)
def q93_incremental_index_update(spark, sf_dir):
    """Incremental inverted-index maintenance: given the q83-style index
    built over crawl snapshot A and the q86 CDC diff to snapshot B
    (added / removed / changed docs), produce the snapshot-B index by
    DELTA operations only — delete the removed/changed docs' old
    postings, insert the added/changed docs' new postings, adjust df/cf
    per term by the delta counts, and recompute champion lists ONLY for
    terms the delta touched (unaffected terms carry their old champion
    rows verbatim). The ORACLE is the full rebuild over snapshot B, so
    the driver's value-hash equality IS the proof that incremental ≡
    rebuild — the property that lets a 100 TB index absorb a 1% crawl
    delta without reprocessing the other 99%.

    Scale shape: the old postings + champions are localCheckpoint-staged
    (they stand in for the persisted index artifact a real system
    reads back); every delta frame is O(changed docs' postings), the
    df/cf adjustment is a full-outer join of term-level counters
    (O(affected vocabulary)), champion recomputation semi-joins p2 down
    to affected terms before its window, and unaffected champions move
    with zero recompute via an anti-join on the tiny affected-term set.
    Snapshot recipe shared with q86 (crawl_ops.py): B misses doc_id%5==0,
    rewrites doc_id%3==0 with ' v2'."""
    d = t(spark, sf_dir, "documents")
    a_docs = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text")
    b_docs = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    # ---- the persisted snapshot-A index artifact (postings + champions)
    p1 = _postings(a_docs).localCheckpoint()
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    champ1 = (
        p1.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _CHAMPIONS)
        .localCheckpoint()
    )
    stats1 = p1.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    # ---- q86's CDC classification -> delete/insert doc-id sets
    fa = a_docs.select("doc_id", F.md5("text").alias("fp_a"))
    fb = b_docs.select("doc_id", F.md5("text").alias("fp_b"))
    # staged: del_ids/ins_ids feed three consumers (delete semi, insert
    # semi, affected vocabulary) — without the barrier each re-runs the
    # two-snapshot scan + md5 + full-outer join (r6, the q148 staging
    # discipline; this is the per-delta checkpoint a real delta loop
    # writes, so lineage stays O(1) in delta count)
    j = fa.join(fb, "doc_id", "full_outer").localCheckpoint(eager=False)
    del_ids = j.filter(
        F.col("fp_b").isNull()
        | (F.col("fp_a").isNotNull() & (F.col("fp_a") != F.col("fp_b")))
    ).select("doc_id")
    ins_ids = j.filter(
        F.col("fp_a").isNull()
        | (F.col("fp_b").isNotNull() & (F.col("fp_a") != F.col("fp_b")))
    ).select("doc_id")
    # ---- delta postings (O(changed docs), never the full corpus)
    del_post = p1.join(del_ids, "doc_id", "left_semi")
    ins_post = _postings(b_docs.join(ins_ids, "doc_id", "left_semi"))
    delta = del_post.select("term", "tf", F.lit(-1).alias("sgn")).unionByName(
        ins_post.select("term", "tf", F.lit(1).alias("sgn"))
    )
    dstat = delta.groupBy("term").agg(
        F.sum("sgn").cast("long").alias("d_df"),
        F.sum(F.col("sgn") * F.col("tf")).cast("long").alias("d_cf"),
    )
    stats2 = (
        stats1.join(dstat, "term", "full_outer")
        .select(
            "term",
            (F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("d_df"), F.lit(0)))
            .cast("long")
            .alias("df"),
            (F.coalesce(F.col("cf"), F.lit(0)) + F.coalesce(F.col("d_cf"), F.lit(0)))
            .cast("long")
            .alias("cf"),
        )
        .filter(F.col("df") > 0)
    )
    # ---- champion lists: recompute ONLY the affected vocabulary
    affected = dstat.select("term")
    p2_affected = (
        p1.join(del_ids, "doc_id", "left_anti")
        .join(affected, "term", "left_semi")
        .unionByName(ins_post)
    )
    champ2_affected = (
        p2_affected.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _CHAMPIONS)
    )
    champ2 = champ1.join(affected, "term", "left_anti").unionByName(champ2_affected)
    return champ2.join(stats2, "term").select(
        "term", "df", "cf", "doc_id", "tf", "first_pos", "rk"
    )


# ------------------------------------------------------------------ q105
_PHRASES = ("order fast", "stream column", "window join")
_PHRASE_TOPK = 10

_PHRASE_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
p AS (SELECT doc_id, CAST(j AS BIGINT) AS pos, ws[j] AS term
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
q AS (SELECT phrase,
             string_split(phrase, ' ')[1] AS w1,
             string_split(phrase, ' ')[2] AS w2
      FROM (SELECT UNNEST(['{_PHRASES[0]}', '{_PHRASES[1]}', '{_PHRASES[2]}'])
                   AS phrase)),
hits AS (SELECT q.phrase, a.doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_hits,
                CAST(MIN(a.pos) AS BIGINT) AS first_pos
         FROM q
         JOIN p a ON a.term = q.w1
         JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                 AND b.term = q.w2
         GROUP BY q.phrase, a.doc_id),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY phrase
                  ORDER BY n_hits DESC, doc_id ASC) AS rk
      FROM hits)
SELECT phrase, doc_id, n_hits, first_pos, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_PHRASE_TOPK}
"""


@query("q105_phrase_search", oracle=_PHRASE_ORACLE)
def q105_phrase_search(spark, sf_dir):
    """Positional phrase search over the inverted index: phrase "w1 w2"
    matches where a posting of w1 at position p meets a posting of w2 at
    p + 1 in the same document (the textbook positional-intersection
    algorithm; Manning, Raghavan & Schuetze ch. 2 — public literature),
    then top-10 documents per phrase by (hit count desc,
    doc_id asc).

    Scale shape: the query phrase table is a handful of rows — BROADCAST
    to both posting probes, so the only corpus-sized work is (1) the
    posting scan filtered to the phrase's two terms (at 10^10 docs the
    postings table is term-bucketed, so these probes are partition-pruned
    point lookups, never full scans) and (2) ONE equi-join of the two
    surviving posting sets on (doc_id, adjacent position) — co-keyed by
    doc_id, which is how the postings were built, so no extra exchange.
    The per-phrase top-k runs on hit rows only. BIGINT counts, total
    (n_hits desc, doc_id) tiebreak. Reference analog: the keyword search
    the reference applies per source query string (config.py search
    terms) — here evaluated as an index join, not a per-page scan.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    ).repartition(spark.sparkContext.defaultParallelism)  # ONE-file scan
    p = d.select("doc_id", F.posexplode("ws").alias("j0", "term")).select(
        "doc_id", (F.col("j0") + 1).cast("long").alias("pos"), "term"
    )
    q = spark.createDataFrame(
        [(ph, *ph.split(" ")) for ph in _PHRASES], "phrase string, w1 string, w2 string"
    )
    a = p.join(F.broadcast(q), p["term"] == q["w1"]).select(
        "phrase", "w2", "doc_id", "pos"
    )
    # pre-filter the second posting probe to the phrase's w2 terms BEFORE
    # the exchange (guide §3.2: the join would otherwise shuffle the full
    # posting table; w2 is an equi-key of the join, so the semi join
    # drops only rows that could never match)
    b = p.join(
        F.broadcast(q.select(F.col("w2").alias("term"))), "term", "semi"
    ).select(
        F.col("doc_id").alias("b_doc"), F.col("pos").alias("b_pos"),
        F.col("term").alias("b_term"),
    )
    hits = (
        a.join(
            b,
            (F.col("b_doc") == F.col("doc_id"))
            & (F.col("b_pos") == F.col("pos") + 1)
            & (F.col("b_term") == F.col("w2")),
        )
        .groupBy("phrase", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("pos").alias("first_pos"),
        )
    )
    w = Window.partitionBy("phrase").orderBy(
        F.col("n_hits").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _PHRASE_TOPK)
        .select("phrase", "doc_id", "n_hits", "first_pos", "rk")
    )


# ------------------------------------------------------------------ q106
_COOC_CAP = 16  # distinct terms kept per doc (by first position, then term)
_COOC_MIN_PAIR = 5  # emit pairs seen together in >= this many docs

_COOC_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
p AS (SELECT doc_id, CAST(j AS BIGINT) AS pos, ws[j] AS term
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
dt AS (SELECT doc_id, term, MIN(pos) AS first_pos
       FROM p GROUP BY doc_id, term),
capped AS (SELECT doc_id, term
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY first_pos ASC, term ASC) AS rk
                 FROM dt)
           WHERE rk <= {_COOC_CAP}),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM capped),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM capped GROUP BY term),
pairs AS (SELECT a.term AS t1, b.term AS t2,
                 CAST(COUNT(*) AS BIGINT) AS c12
          FROM capped a JOIN capped b
            ON b.doc_id = a.doc_id AND a.term < b.term
          GROUP BY a.term, b.term
          HAVING COUNT(*) >= {_COOC_MIN_PAIR})
SELECT p.t1, p.t2, p.c12, d1.c AS c1, d2.c AS c2,
       (n.n_docs * p.c12 * 1000) // (d1.c * d2.c) AS lift_milli
FROM pairs p
JOIN df d1 ON d1.term = p.t1
JOIN df d2 ON d2.term = p.t2
CROSS JOIN n
"""


@query("q106_term_cooccurrence_lift", oracle=_COOC_ORACLE)
def q106_term_cooccurrence_lift(spark, sf_dir):
    """Term co-occurrence mining with integer lift: for every pair of
    terms appearing in the same document, lift = N * c12 / (c1 * c2)
    (association-rule lift; Agrawal & Srikant 1994 — public literature)
    reported as lift_milli = (N * c12 * 1000) div (c1 * c2) so the
    association score is ALL-BIGINT and bit-identical across engines —
    the same reason this repo never emits raw float divisions. Pairs
    must co-occur in >= 5 docs.

    The scale guard is the per-doc cap: each document contributes only
    its first 16 distinct terms (by first position, then term —
    a total order), so pair generation is <= C(16,2) = 120 rows
    per doc no matter how long the document is — O(corpus) total, never
    O(len^2). The pair groupBy is map-side combined on skinny
    (t1, t2) keys; doc frequencies come from the SAME capped set, so
    lift is internally consistent. At 10^10 docs the standard extra
    guard is a df band (drop stopword-frequency terms before pairing);
    the cap already bounds the worst case without it. Reference analog:
    the tag/keyword affinity the reference eyeballs per category
    (config.py search-term groups) — here learned from the corpus.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    p = d.select("doc_id", F.posexplode("ws").alias("j0", "term")).select(
        "doc_id", (F.col("j0") + 1).cast("long").alias("pos"), "term"
    )
    dt = p.groupBy("doc_id", "term").agg(F.min("pos").alias("first_pos"))
    w_cap = Window.partitionBy("doc_id").orderBy(
        F.col("first_pos").asc(), F.col("term").asc()
    )
    capped = (
        dt.withColumn("rk", F.row_number().over(w_cap))
        .filter(F.col("rk") <= _COOC_CAP)
        .select("doc_id", "term")
    )
    n1 = capped.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_t = capped.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    b = capped.select(F.col("doc_id").alias("b_doc"), F.col("term").alias("t2"))
    pairs = (
        capped.join(b, (F.col("b_doc") == F.col("doc_id")) & (F.col("term") < F.col("t2")))
        .groupBy(F.col("term").alias("t1"), "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= _COOC_MIN_PAIR)
    )
    d1 = df_t.select(F.col("term").alias("t1"), F.col("c").alias("c1"))
    d2 = df_t.select(F.col("term").alias("t2"), F.col("c").alias("c2"))
    return (
        pairs.join(d1, "t1")
        .join(d2, "t2")
        .crossJoin(F.broadcast(n1))
        .select(
            "t1",
            "t2",
            "c12",
            "c1",
            "c2",
            F.expr("(n_docs * c12 * 1000) div (c1 * c2)").alias("lift_milli"),
        )
    )


# ------------------------------------------------------------------ q115
_VARINT_SQL = """
CASE WHEN {v} < 128 THEN 1
     WHEN {v} < 16384 THEN 2
     WHEN {v} < 2097152 THEN 3
     WHEN {v} < 268435456 THEN 4
     ELSE 5 END
"""

_PLC_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
p AS (SELECT DISTINCT ws[j] AS term, doc_id
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
gaps AS (
  SELECT term, doc_id,
         doc_id - COALESCE(LAG(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
                           -1) AS gap
  FROM p)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
       CAST(SUM({_VARINT_SQL.format(v="gap")}) AS BIGINT) AS varint_bytes,
       (1000 * CAST(SUM({_VARINT_SQL.format(v="gap")}) AS BIGINT))
         // (8 * COUNT(*)) AS compression_permille
FROM gaps
GROUP BY term
"""


@query("q115_postings_compression", oracle=_PLC_ORACLE)
def q115_postings_compression(spark, sf_dir):
    """Posting-list storage planning: per term, the byte cost of the
    standard delta-gap + varint encoding (store doc_id deltas, each in
    1-5 LEB128-style bytes — the universal inverted-index layout; IR
    textbook / Lucene's packed postings) versus raw 8-byte ids, with the
    ratio in permille. The first posting's gap is doc_id - (-1) so every
    gap is >= 1 and the encoding is self-delimiting from an empty state.
    Varint width is a CASE over power-of-128 thresholds — pure integer
    comparisons, no log2 — so both engines agree bit-for-bit. Doc-id
    space here fits 5 bytes (2^35); a 10^10-doc id space adds the
    6th/7th threshold rows, same CASE shape.

    Why it matters at scale: the index writer must BUDGET segment sizes
    before writing 100 TB of postings — frequent terms compress to ~1
    byte/posting (dense gaps), rare terms stay near 5; this query is
    that planning table. Scale shape: distinct (term, doc_id) postings
    (one shuffle, the same key the index build q83 already uses), a LAG
    window per term partition (parallel across the vocabulary; the
    longest posting list is one partition's sort, the q83 champion-list
    cap is the documented bound), then a map-side-combined per-term fold.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    p = (
        d.select("doc_id", F.explode("ws").alias("term"))
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = p.select(
        "term",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id").over(w), F.lit(-1).cast("long"))
        ).alias("gap"),
    )
    vb = (
        F.when(F.col("gap") < 128, 1)
        .when(F.col("gap") < 16384, 2)
        .when(F.col("gap") < 2097152, 3)
        .when(F.col("gap") < 268435456, 4)
        .otherwise(5)
    )
    return (
        gaps.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(vb).alias("varint_bytes"),
        )
        .select(
            "term",
            "df",
            (8 * F.col("df")).alias("raw_bytes"),
            "varint_bytes",
            F.expr("(1000 * varint_bytes) div (8 * df)").alias(
                "compression_permille"
            ),
        )
    )


# ------------------------------------------------------------------ q123
_BMW_BLOCK = 4  # postings per block (production: 64-128)

_BMW_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
p AS (SELECT doc_id, ws[j] AS term
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _),
tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
       FROM p GROUP BY term, doc_id),
stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
b AS (SELECT term, doc_id, tf,
             (ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id ASC) - 1)
               // {_BMW_BLOCK} AS blk
      FROM tf)
SELECT b.term, s.df, CAST(b.blk AS BIGINT) AS block_id,
       CAST(COUNT(*) AS BIGINT) AS n_postings,
       CAST(MIN(b.doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(b.doc_id) AS BIGINT) AS max_doc,
       CAST(MAX(b.tf) AS BIGINT) AS block_max_tf
FROM b JOIN stats s ON s.term = b.term
WHERE s.df >= {_BMW_BLOCK}
GROUP BY b.term, s.df, b.blk
"""


@query("q123_blockmax_postings", oracle=_BMW_ORACLE)
def q123_blockmax_postings(spark, sf_dir):
    """Block-max index metadata — the skip structure behind Block-Max
    WAND (Ding & Suel, SIGIR 2011 — public literature): chop each
    term's doc_id-ordered posting list into fixed-size blocks and store,
    per block, its doc_id range and its MAXIMUM term frequency (the
    upper bound on any impact score inside the block). Query-time WAND
    skips a whole block whenever df-scaled block_max_tf cannot beat the
    current top-k threshold — top-k retrieval without decompressing
    most of a common term's postings. Emits (term, df, block_id,
    n_postings, min_doc, max_doc, block_max_tf) for terms with df >=
    block size; all-BIGINT, total ordering by doc_id inside each list.

    Scale shape: the ONLY corpus-sized exchange is the map-side-combined
    (term, doc_id) tf aggregate (the audited q83 shape — distinct pairs,
    never raw tokens); the blocking window and the per-(term, block)
    rollup both ride that same term hash partitioning (window + groupBy
    on the window's partition key = no second exchange of posting rows),
    and the df join moves term-level rows only. Stopword terms make long
    lists, not hot CELLS — the window is per-term sequential exactly
    like the index layout it models; a 10^8-posting term streams through
    one task the same way its posting list would stream to disk, and
    list-splitting (the q68 two-level prefix sum on (term, range))
    is the documented swap-in past that.

    Reference semantic: none — the reference greps titles
    (ai_content_validator.py:60-106); a web-scale index prunes at the
    block level so common terms stay queryable."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # ONE-file scan (guide §2.5)
    ).select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tf = d.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy(F.col("doc_id").asc())
    b = tf.withColumn(
        "block_id",
        ((F.row_number().over(w) - 1) / _BMW_BLOCK).cast("long"),
    )
    return (
        b.groupBy("term", "block_id")
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.max("tf").alias("block_max_tf"),
        )
        .join(stats.filter(F.col("df") >= _BMW_BLOCK), "term")
        .select(
            "term", "df", "block_id", "n_postings",
            "min_doc", "max_doc", "block_max_tf",
        )
    )


# ------------------------------------------------------------------ q124
_FC_OVERHEAD = 2  # bytes per entry for the (lcp, suffix_len) varint pair

_FC_ORACLE = f"""
WITH u AS ({{urls}}),
o AS (SELECT host, url,
             lag(url) OVER (PARTITION BY host ORDER BY url ASC) AS prev
      FROM u),
l AS (SELECT host, url,
             CASE WHEN prev IS NULL THEN 0
                  ELSE COALESCE(
                    list_filter(range(1, least(length(url), length(prev)) + 1),
                                i -> substr(url, i, 1) <> substr(prev, i, 1))[1] - 1,
                    least(length(url), length(prev)))
             END AS lcp
      FROM o)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(length(url)) AS BIGINT) AS raw_bytes,
       CAST(SUM(length(url) - lcp + {_FC_OVERHEAD}) AS BIGINT) AS coded_bytes,
       (1000 * CAST(SUM(lcp - {_FC_OVERHEAD}) AS BIGINT))
         // CAST(SUM(length(url)) AS BIGINT) AS savings_permille
FROM l GROUP BY host
"""


from .graph import _TRAP_URLS_SQL  # noqa: E402


@query("q124_frontcoded_url_index", oracle=_FC_ORACLE.format(urls=_TRAP_URLS_SQL))
def q124_frontcoded_url_index(spark, sf_dir):
    """Front-coding cost model for the URL index — the delta encoding
    every CDX / URL-seen index uses on disk (sorted URLs share long
    prefixes; store only (lcp, suffix) per entry — Witten, Moffat &
    Bell, Managing Gigabytes; CDX files in public web-archive practice):
    sort each host's URLs, compute each entry's longest common prefix
    with its predecessor EXACTLY (first-mismatch position over the
    shared range — array ops, no UDF), and report per host the raw vs
    front-coded byte cost and the savings in permille (2-byte per-entry
    overhead charged). This is the sizing model for the q91 CDX index
    and the url_seen shards — "how many bytes does a 10^10-URL sorted
    index really take".

    Scale shape: zero shuffle beyond ONE hash exchange on host — the
    sort is per-host (Window.partitionBy(host).orderBy(url)), exactly
    the index's on-disk order, and the rollup rides the same
    partitioning. The lcp is a JVM-side higher-order filter over a
    <=60-element position array — no Python, no quadratic anything.
    Mega-hosts: the same host-salting as the frontier applies by
    splitting on fixed url-prefix buckets (front coding restarts per
    block on disk anyway). All-BIGINT output.

    Reference semantic: the reference keeps its seen-set as a JSON list
    in memory (enhanced_batch_processor.py:106); at web scale the
    seen-index is a sorted, front-coded structure — this query is its
    capacity planner."""
    from .graph import trap_url_frame

    u = trap_url_frame(spark, sf_dir)
    w = Window.partitionBy("host").orderBy(F.col("url").asc())
    o = u.withColumn("prev", F.lag("url").over(w))
    lcp = F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
        F.coalesce(
            F.element_at(
                F.expr(
                    "filter(sequence(1, least(length(url), length(prev))),"
                    " i -> substr(url, i, 1) != substr(prev, i, 1))"
                ),
                1,
            )
            - 1,
            F.least(F.length("url"), F.length("prev")),
        )
    )
    l = o.select("host", "url", lcp.cast("long").alias("lcp"))
    return l.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.length("url")).cast("long").alias("raw_bytes"),
        F.sum(F.length("url") - F.col("lcp") + _FC_OVERHEAD)
        .cast("long")
        .alias("coded_bytes"),
        F.expr(
            f"(1000 * sum(lcp - {_FC_OVERHEAD})) div sum(length(url))"
        ).alias("savings_permille"),
    )


# ------------------------------------------------------------------ q136
_WAND_TERMS = ("spark", "merge", "window")
_WAND_K = 5

_WAND_TERMS_SQL = ", ".join(f"'{t}'" for t in _WAND_TERMS)

_WAND_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
p AS (SELECT doc_id, ws[j] AS term
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _
      WHERE ws[j] IN ({_WAND_TERMS_SQL})),
tf AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
       FROM p GROUP BY term, doc_id),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(MAX(tf) AS BIGINT) AS max_tf
       FROM tf GROUP BY term),
sw AS (SELECT term, df, max_tf, (1000 * nn.n) // df AS idf_milli
       FROM st CROSS JOIN nn),
sc AS (SELECT tf.doc_id, CAST(SUM(tf.tf * sw.idf_milli) AS BIGINT) AS score
       FROM tf JOIN sw ON sw.term = tf.term GROUP BY tf.doc_id),
thr AS (SELECT CAST(MIN(score) AS BIGINT) AS threshold FROM (
          SELECT score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
          FROM sc) WHERE rk <= {_WAND_K}),
others AS (SELECT sw.term, sw.df, sw.idf_milli,
                  (SELECT SUM(s2.max_tf * s2.idf_milli) FROM sw s2) -
                    sw.max_tf * sw.idf_milli AS sum_others
           FROM sw),
b AS (SELECT tf.term, tf.doc_id, tf.tf,
             (ROW_NUMBER() OVER (PARTITION BY tf.term ORDER BY tf.doc_id ASC) - 1)
               // {_BMW_BLOCK} AS blk
      FROM tf),
bm AS (SELECT term, blk, CAST(MAX(tf) AS BIGINT) AS block_max_tf
       FROM b GROUP BY term, blk)
SELECT o.term, o.df, o.idf_milli, t.threshold,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN bm.block_max_tf * o.idf_milli + o.sum_others
                          < t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
       (1000 * CAST(SUM(CASE WHEN bm.block_max_tf * o.idf_milli + o.sum_others
                                  < t.threshold THEN 1 ELSE 0 END) AS BIGINT))
         // CAST(COUNT(*) AS BIGINT) AS skip_permille
FROM bm JOIN others o ON o.term = bm.term CROSS JOIN thr t
GROUP BY o.term, o.df, o.idf_milli, t.threshold
"""


@query("q136_maxscore_block_skip", oracle=_WAND_ORACLE)
def q136_maxscore_block_skip(spark, sf_dir):
    """MaxScore/Block-Max skip-rate diagnostic — the measurement that
    justifies q123's block metadata (Turtle & Flood 1995 MaxScore;
    Ding & Suel 2011 BMW — public literature): for a fixed 3-term
    query, compute the EXACT top-k threshold under quantized integer
    impacts (impact = tf x idf_milli, idf_milli = (1000N) div df — the
    impact-quantization real indexes store), then count, per query
    term, how many of its posting blocks a MaxScore-style check can
    skip outright: block upper bound (block_max_tf x idf_milli) plus
    the OTHER terms' global maximum impacts still under the threshold
    means no document inside the block can reach the top k. Emits per
    term (df, idf_milli, threshold, n_blocks, n_skippable,
    skip_permille) — all BIGINT. This is deliberately the
    per-block-decidable BOUND (true WAND pivoting is sequential and
    can only skip MORE); honest framing in exchange for exact
    cross-engine replay.

    Scale shape: the postings explode is FILTERED TO THE QUERY TERMS
    BEFORE aggregation (the audited q87 move — the exchange carries
    O(query hits), not O(tokens)); scores, thresholds, per-term stats
    and block maxima are all query-hit-level frames; the threshold and
    the 3-row term stats broadcast. At 10^10 docs a 3-term query
    scores millions of rows, not trillions — exactly why impact
    quantization + block skipping is the production query path.
    Reference semantic: none — the reference greps; this is the
    query-time half of the index the engine builds (q83/q123)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.col("term").isin(*_WAND_TERMS))
    tf = d.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    nn = t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n"))
    st = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.max("tf").alias("max_tf")
    )
    sw = st.crossJoin(F.broadcast(nn)).select(
        "term", "df", "max_tf", F.expr("(1000 * n) div df").alias("idf_milli")
    )
    sc = (
        tf.join(F.broadcast(sw.select("term", "idf_milli")), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_milli")).cast("long").alias("score"))
    )
    wr = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    thr = (
        sc.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _WAND_K)
        .agg(F.min("score").cast("long").alias("threshold"))
    )
    tot = sw.agg(
        F.sum(F.col("max_tf") * F.col("idf_milli")).cast("long").alias("tot_imp")
    )
    others = sw.crossJoin(F.broadcast(tot)).select(
        "term",
        "df",
        "idf_milli",
        (F.col("tot_imp") - F.col("max_tf") * F.col("idf_milli")).alias("sum_others"),
    )
    wb = Window.partitionBy("term").orderBy(F.col("doc_id").asc())
    bm = (
        tf.withColumn("blk", ((F.row_number().over(wb) - 1) / _BMW_BLOCK).cast("long"))
        .groupBy("term", "blk")
        .agg(F.max("tf").cast("long").alias("block_max_tf"))
    )
    skip = F.sum(
        F.when(
            F.col("block_max_tf") * F.col("idf_milli") + F.col("sum_others")
            < F.col("threshold"),
            1,
        ).otherwise(0)
    ).cast("long")
    return (
        bm.join(F.broadcast(others), "term")
        .crossJoin(F.broadcast(thr))
        .groupBy("term", "df", "idf_milli", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            skip.alias("n_skippable"),
            F.expr(
                "(1000 * sum(case when block_max_tf * idf_milli + sum_others"
                " < threshold then 1 else 0 end)) div count(1)"
            ).alias("skip_permille"),
        )
    )


# ------------------------------------------------------------------ q138
_PROX_TERMS = ("spark", "merge", "window")
_PROX_TERMS_SQL = ", ".join(f"'{t}'" for t in _PROX_TERMS)

_PROX_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
p AS (SELECT doc_id, ws[j] AS term, CAST(j AS BIGINT) AS pos
      FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _
      WHERE ws[j] IN ({_PROX_TERMS_SQL})),
hasall AS (SELECT doc_id FROM p GROUP BY doc_id
           HAVING COUNT(DISTINCT term) = 3),
pairs AS (
  SELECT a.doc_id, a.term AS t1, b.term AS t2,
         CAST(MIN(abs(a.pos - b.pos)) AS BIGINT) AS min_dist
  FROM p a JOIN p b ON b.doc_id = a.doc_id AND a.term < b.term
  JOIN hasall h ON h.doc_id = a.doc_id
  GROUP BY a.doc_id, a.term, b.term)
SELECT doc_id,
       CAST(SUM(min_dist) AS BIGINT) AS prox_sum,
       CAST(MAX(min_dist) AS BIGINT) AS prox_max,
       (1000000 // (1 + CAST(SUM(min_dist) AS BIGINT))) AS prox_score_micro
FROM pairs GROUP BY doc_id
"""


@query("q138_term_proximity_scoring", oracle=_PROX_ORACLE)
def q138_term_proximity_scoring(spark, sf_dir):
    """Pairwise term-proximity scoring — the positional ranking signal
    BM25 lacks (Clarke, Cormack & Tudhope 2000; Büttcher et al. 2006 —
    public literature): for documents containing ALL query terms, the
    minimum positional distance for each term PAIR, their sum and max
    (the span proxies), and an integer proximity score 10^6/(1+sum) in
    micro units. Documents where the query terms cluster tightly
    outrank scattered mentions; this composes with q87's BM25 as the
    standard two-stage ranker. Pairwise-min is deliberately the bound
    computed (the exact minimal 3-term window is a sequential
    merge-scan — same honest framing as q136's per-block skip bound).

    Scale shape: positions are exploded FOR THE QUERY TERMS ONLY (the
    q87/q136 filtered-explode move — O(query hits), not O(tokens)),
    the all-terms gate and the pair-distance self-join are keyed by
    doc_id (per-doc position lists are query-term occurrences only,
    single digits — the 'quadratic' is bounded by per-doc term counts,
    not corpus size), and everything downstream is doc-level. At 10^10
    docs the exchange is O(matching docs). Reference semantic: none —
    the reference's keyword scan (ai_content_validator.py:60-106) is
    presence-only; ranking needs positions, which q83 already stores
    (first_pos) and this query generalizes."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("j0", "term")
    ).select("doc_id", (F.col("j0") + 1).cast("long").alias("pos"), "term").filter(
        F.col("term").isin(*_PROX_TERMS)
    )
    p = d.localCheckpoint(eager=False)
    hasall = (
        p.groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == 3)
        .select("doc_id")
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .join(
            hasall.select(F.col("doc_id").alias("h_doc")),
            F.col("a.doc_id") == F.col("h_doc"),
        )
        .groupBy(F.col("a.doc_id").alias("did"), "a.term", "b.term")
        .agg(F.min(F.abs(F.col("a.pos") - F.col("b.pos"))).cast("long").alias("min_dist"))
    )
    return pairs.groupBy(F.col("did").alias("doc_id")).agg(
        F.sum("min_dist").cast("long").alias("prox_sum"),
        F.max("min_dist").cast("long").alias("prox_max"),
        F.expr("1000000 div (1 + sum(min_dist))").alias("prox_score_micro"),
    )


# ------------------------------------------------------------------ q146
_TID_ORACLE = """
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT doc_id, ws[j] AS term
        FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _
        WHERE len(ws[j]) > 0),
old_v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
          FROM tok WHERE doc_id % 2 = 0 GROUP BY term),
old_ids AS (SELECT term, freq,
                   CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC)
                        AS BIGINT) AS term_id
            FROM old_v),
full_v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY term),
mx AS (SELECT CAST(COALESCE(MAX(term_id), 0) AS BIGINT) AS m FROM old_ids),
new_terms AS (SELECT f.term, f.freq
              FROM full_v f WHERE NOT EXISTS
                (SELECT 1 FROM old_ids o WHERE o.term = f.term)),
new_ids AS (SELECT term, freq,
                   mx.m + CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC)
                               AS BIGINT) AS term_id
            FROM new_terms CROSS JOIN mx)
SELECT o.term, o.term_id, f.freq, FALSE AS is_new
FROM old_ids o JOIN full_v f ON f.term = o.term
UNION ALL
SELECT term, term_id, freq, TRUE AS is_new FROM new_ids
"""


@query("q146_stable_term_ids", oracle=_TID_ORACLE)
def q146_stable_term_ids(spark, sf_dir):
    """Stable incremental term-id assignment — the vocabulary table
    every index / embedding pipeline versions: ids assigned once are
    NEVER reassigned (postings, embedding rows and model checkpoints
    all key on them), new vocabulary appends after the old maximum.
    Snapshot A (docs with even ids — the prior index generation)
    assigns ids by (freq desc, term) rank; the full corpus then keeps
    every old id verbatim and gives only genuinely-new terms fresh ids
    continuing from max(old), ranked by their full-corpus frequency
    with the same total tiebreak. Emits (term, term_id, current freq,
    is_new). The frequency-ordering of generation-0 ids is the classic
    varbyte-friendly layout (small ids = frequent terms = short codes,
    the q115 cost model's assumption).

    Scale shape: two map-side-combined token aggregates (old and full
    vocabularies — skinny term keys), an anti-join for the new-term
    set, and rank windows over VOCABULARY-sized frames that now run
    SHARD-PARALLEL via ordinals.sharded_ordinal (two-level prefix sum
    sharded by freq bit length — no unpartitioned window even at 10^8+
    types). The old-id table joins back by term — at production scale
    that table is the persisted artifact of the previous run
    (catalog.py), not a recomputation; recomputing it here from the
    even-doc snapshot is what makes the query self-contained and
    oracle-checkable. Reference semantic: the reference keys items by
    source-assigned ids (pexels_scraper.py:89); an index must MINT its
    own stable ids and keep them stable across generations."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).filter(F.length("term") > 0)
    from ..operators.ordinals import sharded_ordinal

    # frequency-rank windows run shard-parallel (two-level prefix sum):
    # the shard is the NEGATED bit length of freq — monotone
    # non-decreasing along (freq DESC), ~log2(max freq) buckets, and the
    # within-shard window refines with the full (freq desc, term) key
    def _freq_rank(v, out):
        blen = F.length(F.conv(F.col("freq").cast("string"), 10, 2)).cast("long")
        return sharded_ordinal(
            v, [F.col("freq").desc(), F.col("term").asc()], -blen, out=out
        )

    old_v = (
        d.filter(F.col("doc_id") % 2 == 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    old_ids = _freq_rank(old_v, "term_id").select("term", "term_id")
    full_v = (
        d.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=False)
    )
    mx = old_ids.agg(F.coalesce(F.max("term_id"), F.lit(0)).alias("m"))
    new_terms = full_v.join(old_ids, "term", "left_anti").localCheckpoint(
        eager=False
    )
    new_ids = _freq_rank(new_terms, "_nrk").crossJoin(F.broadcast(mx)).select(
        "term",
        (F.col("m") + F.col("_nrk")).cast("long").alias("term_id"),
        "freq",
        F.lit(True).alias("is_new"),
    )
    old_out = old_ids.join(full_v, "term").select(
        "term", "term_id", "freq", F.lit(False).alias("is_new")
    )
    return old_out.unionByName(new_ids.select("term", "term_id", "freq", "is_new"))


# ------------------------------------------------------------------ q151
_SHARDS = 8


def _varint_bytes_sql(x: str) -> str:
    """Varint width of a BIGINT as a CASE over power-of-128 thresholds
    (the q115 idiom — no log2)."""
    return (
        f"(CASE WHEN {x} < 128 THEN 1 WHEN {x} < 16384 THEN 2"
        f" WHEN {x} < 2097152 THEN 3 WHEN {x} < 268435456 THEN 4"
        f" ELSE 5 END)"
    )


_SHARD_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
tok AS (SELECT doc_id, ws[j] AS term
        FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS j) _
        WHERE len(ws[j]) > 0),
tf AS (SELECT term, doc_id FROM tok GROUP BY term, doc_id),
v AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
ids AS (SELECT term, df,
               CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS BIGINT)
                 AS term_id
        FROM v),
cost AS (SELECT term_id % {_SHARDS} AS shard, df,
                CAST(df * {_varint_bytes_sql('term_id')} AS BIGINT) AS est_bytes
         FROM ids),
per AS (SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(df) AS BIGINT) AS n_postings,
               CAST(SUM(est_bytes) AS BIGINT) AS est_bytes
        FROM cost GROUP BY shard),
g AS (SELECT CAST(SUM(n_postings) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS k FROM per)
SELECT p.shard, p.n_terms, p.n_postings, p.est_bytes,
       (1000 * p.n_postings * g.k) // g.tot AS load_permille_of_even
FROM per p CROSS JOIN g
"""


@query("q151_index_shard_forecast", oracle=_SHARD_ORACLE)
def q151_index_shard_forecast(spark, sf_dir):
    """Index-shard load forecast — before writing a term-partitioned
    index, predict each shard's posting load so the writer can rebalance
    (the term-id modulo sharding every distributed index starts with;
    public practice in sharded Lucene/ES-class systems). Terms get q146
    frequency-ranked ids; shard = term_id mod 8; per shard: term count,
    posting count, varint-cost byte estimate (q115's width CASE over the
    term-id magnitude), and the shard's load relative to perfectly even
    in permille (1000 = even; stopword-heavy shards run hot because
    ROUND-ROBIN id sharding intentionally splits the rank order — the
    report shows how well that works).

    Scale shape: one map-side-combined (term, doc) distinct, one
    vocabulary rollup, a shard-parallel frequency rank (the q146
    negated-bit-length shard over ordinals.sharded_ordinal — no
    vocabulary-sized single-task window), and an 8-row report. Nothing
    corpus-sized moves twice. Reference semantic: none — the reference
    has no index; capacity planning is what lets one exist at 10^10
    docs."""
    from ..operators.ordinals import sharded_ordinal

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.length("term") > 0)
    tf = d.groupBy("term", "doc_id").agg(F.lit(1).alias("_one"))
    v = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).localCheckpoint(
        eager=False
    )
    blen = F.length(F.conv(F.col("df").cast("string"), 10, 2)).cast("long")
    ids = sharded_ordinal(
        v, [F.col("df").desc(), F.col("term").asc()], -blen, out="term_id"
    ).select("df", "term_id")
    vb = F.expr(_varint_bytes_sql("term_id"))
    cost = ids.select(
        (F.col("term_id") % _SHARDS).alias("shard"),
        "df",
        (F.col("df") * vb).cast("long").alias("est_bytes"),
    )
    per = cost.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.sum("est_bytes").cast("long").alias("est_bytes"),
    )
    g = per.agg(
        F.sum("n_postings").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        "shard",
        "n_terms",
        "n_postings",
        "est_bytes",
        F.expr("(1000 * n_postings * k) div tot").alias("load_permille_of_even"),
    )
