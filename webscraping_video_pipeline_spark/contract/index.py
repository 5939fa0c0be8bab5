"""Index-build operators (round 4, session 2): the two web-search-side
products a crawl's output feeds that no prior contract query built —

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
    j = fa.join(fb, "doc_id", "full_outer")
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
