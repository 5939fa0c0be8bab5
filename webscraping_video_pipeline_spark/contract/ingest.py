"""Crawl-ingest and search-side products (round 4, session 3): five
operators between "pages fetched" and "corpus served" that no prior
contract query covered —

- **q87 BM25 ranked retrieval**: score every document against a fixed
  query-term set with BM25 (k1=1.2, b=0.75) over the same tokenization
  as the q83 inverted index, returning the global top-20. The
  query-time half of the q83 index build (Robertson & Zaragoza, 2009).
- **q88 mirror-host detection**: Bharat & Broder (1999) style — hosts
  sharing many *rare* content shingles are mirrors; common shingles
  (boilerplate) are censused and excluded via a broadcast anti-join
  (the reworked cap_buckets idiom), so host pairing never touches a
  hot shingle bucket.
- **q89 shingle containment**: the asymmetric near-dup measure
  |A∩B|/|A| (Broder's containment) for neighbor doc pairs — catches
  quotes/excerpts where symmetric Jaccard (q26) stays low.
- **q90 sitemap URL discovery**: parse ``<loc>`` entries out of
  per-page sitemap XML with a vectorized regex, aggregate referrers,
  and anti-join the already-crawled URL set — the discovery half of
  the J2 seen anti-join (reference seeds from static config,
  config.py:15-72; an open crawl discovers).
- **q91 WARC/CDX offset index**: per-WARC-file byte offset + length +
  digest for every record via a per-file prefix sum — the Common-Crawl
  CDX index build that makes a petabyte archive random-access.

All inputs derive deterministically from ``documents`` (the md5-fanout
recipe shared with q80's link graph), so each query has an exact
DuckDB oracle. Cross-engine determinism: every double is produced by
ONE identically-parenthesized expression then (where summed) cast to
decimal(27,12) and accumulated exactly; counts are BIGINT; rankings
carry total tiebreaks.

Reference semantic: the reference's search surface is per-item stored
metadata (enhanced_batch_processor.py:569-584) and its dedupe is
exact-id (enhanced_batch_processor.py:515-519); q87/q88/q89 are the
ranked-retrieval and near-mirror generalizations, q90/q91 the
discovery and archive-index halves its per-source loop never needs
(parallel_scraper_manager.py:140-178 fetches a fixed list).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.cc import components
from . import query, t

# ------------------------------------------------------------------ q87
_BM25_TERMS = ("vector", "merge", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_BM25_TERMS_SQL = ", ".join(f"'{w}'" for w in _BM25_TERMS)


@query(
    "q87_bm25_topk",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    hits AS (SELECT d.doc_id, u.term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM d, LATERAL (SELECT unnest(ws) AS term) u
             WHERE u.term IN ({_BM25_TERMS_SQL})
             GROUP BY d.doc_id, u.term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT h.doc_id, h.term,
             CAST(
               ln(CAST(1.0 AS DOUBLE)
                  + (CAST(g.nd - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * ((CAST(h.tf AS DOUBLE) * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
                  / (CAST(h.tf AS DOUBLE)
                     + CAST({_BM25_K1!r} AS DOUBLE)
                       * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                          + CAST({_BM25_B!r} AS DOUBLE)
                            * (CAST(dl.dl AS DOUBLE)
                               / (CAST(g.sum_dl AS DOUBLE) / CAST(g.nd AS DOUBLE))))))
             AS DECIMAL(27,12)) AS s
      FROM hits h JOIN df ON df.term = h.term
                  JOIN dl ON dl.doc_id = h.doc_id
                  CROSS JOIN g),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                   SUM(s) AS score_x
            FROM scored GROUP BY doc_id),
    rk AS (SELECT doc_id, n_terms, CAST(score_x AS DOUBLE) AS score,
                  ROW_NUMBER() OVER (ORDER BY score_x DESC, doc_id ASC) AS rk
           FROM agg)
    SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_terms, score
    FROM rk WHERE rk <= {_BM25_TOPK}
    """,
)
def q87_bm25_topk(spark, sf_dir, _capture=None):
    """BM25 top-k retrieval for a fixed conjunctive-OR term set over the
    q83 tokenization. Per-(doc,term) score is ONE identically-
    parenthesized double expression (idf * tf*(k1+1) / (tf + k1*(1-b +
    b*dl/avgdl))) cast to decimal(27,12); per-doc totals are exact
    decimal sums, so cross-engine and cross-partitioning bit equality
    holds all the way through the ranking.

    Scale shape: the explode is filtered to the query terms BEFORE any
    shuffle, so the (doc,term) aggregate exchanges only matching
    postings (O(query hits), not O(tokens)); df and the global
    (N, sum_dl) are tiny broadcast frames; the final top-k is a single
    window over the per-doc scores — at production size that window
    runs per-partition top-k + merge exactly like q03 (see
    operators/frontier.py for the salted variant). Query evaluation
    against the PREBUILT q83 champion-list index (instead of raw text)
    is the production path; this query certifies the scoring math
    end-to-end from text so the oracle is self-contained."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum(F.size("ws")).cast("long").alias("sum_dl"),
    )
    # dl rides the aggregate key (it is functionally determined by doc_id),
    # so no separate doc-length join is ever shuffled
    hits_pre = (
        d.select(
            "doc_id",
            F.size("ws").cast("long").alias("dl"),
            F.explode("ws").alias("term"),
        )
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if _capture is not None:
        _capture["q87.postings"] = hits_pre
    # hits (the query-term postings) feeds both the df census and the
    # scoring join; checkpointing it runs the corpus scan+explode ONCE
    # — materialized query-term postings ARE what the q83 index stores
    hits = hits_pre.localCheckpoint()
    df = hits.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tf_d = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("nd") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("nd").cast("double")
    score = idf * (
        (tf_d * F.lit(_BM25_K1 + 1.0))
        / (
            tf_d
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl))
        )
    )
    scored = (
        hits.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(g))
        .select("doc_id", score.cast("decimal(27,12)").alias("s"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("s").alias("score_x"),
    )
    w = Window.orderBy(F.col("score_x").desc(), F.col("doc_id").asc())
    return (
        agg.select(
            F.row_number().over(w).cast("long").alias("rk"),
            "doc_id",
            "n_terms",
            F.col("score_x").cast("double").alias("score"),
        )
        .filter(F.col("rk") <= _BM25_TOPK)
    )


# ------------------------------------------------------------------ q88
_MIRROR_SHINGLE = 5
_MIRROR_HOSTS = 40
_MIRROR_DF_CAP = 4  # shingles on more hosts than this are boilerplate

_MIRROR_RARE_SQL = f"""
    w AS (SELECT doc_id, 'h' || CAST(doc_id % {_MIRROR_HOSTS} AS VARCHAR) AS host,
                 string_split(lower(text), ' ') AS ws
          FROM documents),
    s AS (SELECT DISTINCT host,
                 md5(ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2] || ' ' ||
                     ws[j+3] || ' ' || ws[j+4]) AS fp
          FROM w, LATERAL (SELECT unnest(range(1, len(ws) - {_MIRROR_SHINGLE - 2})) AS j) _),
    hot AS (SELECT fp FROM s GROUP BY fp HAVING COUNT(*) > {_MIRROR_DF_CAP}),
    rare AS (SELECT s.* FROM s WHERE NOT EXISTS
             (SELECT 1 FROM hot WHERE hot.fp = s.fp))
"""


@query(
    "q88_mirror_host_pairs",
    oracle=f"""
    WITH {_MIRROR_RARE_SQL},
    sz AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM rare GROUP BY host),
    pairs AS (SELECT a.host AS host_a, b.host AS host_b,
                     CAST(COUNT(*) AS BIGINT) AS shared
              FROM rare a JOIN rare b ON b.fp = a.fp AND a.host < b.host
              GROUP BY a.host, b.host)
    SELECT p.host_a, p.host_b, p.shared, sa.n AS size_a, sb.n AS size_b,
           CAST(p.shared AS DOUBLE) / CAST(sa.n + sb.n - p.shared AS DOUBLE)
             AS jaccard
    FROM pairs p JOIN sz sa ON sa.host = p.host_a
                 JOIN sz sb ON sb.host = p.host_b
    """,
)
def q88_mirror_host_pairs(spark, sf_dir, _capture=None):
    """Mirror-host detection (Bharat & Broder 1999): hosts sharing rare
    content shingles are mirror candidates, scored by Jaccard over their
    boilerplate-filtered shingle sets. Emits every host pair sharing >=1
    rare shingle with (shared, sizes, jaccard).

    Scale shape: the hot-shingle census (`hot`) holds ONLY shingles on
    more than `_MIRROR_DF_CAP` hosts — tiny, broadcast back as an
    anti-join (the ADVICE-reworked cap_buckets idiom from
    operators/lsh.py: no window over the full shingle set). Host pairing
    then happens inside rare-shingle buckets of <= cap hosts each, so
    the self-join fans out <= cap^2/2 pairs per shingle — quadratic
    blowup on boilerplate is impossible by construction. Host-level
    Jaccard needs only the pair counts plus the per-host set sizes
    (two skinny broadcast joins), never a host-by-host matrix."""
    # repartition: ONE-file scan -> the shingle explode + md5 + the
    # distinct's map-side partial aggregation would otherwise run on a
    # single core (guide §2.5 unsplittable-input case)
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = F.split(F.lower(F.col("text")), " ")
    shingles = F.when(
        F.size(F.col("ws")) >= _MIRROR_SHINGLE,
        F.expr(
            f"transform(sequence(1, size(ws) - {_MIRROR_SHINGLE - 1}),"
            f" j -> concat_ws(' ', slice(ws, j, {_MIRROR_SHINGLE})))"
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    s_pre = (
        d.select(
            F.concat(F.lit("h"), (F.col("doc_id") % _MIRROR_HOSTS).cast("string")).alias(
                "host"
            ),
            ws.alias("ws"),
        )
        .select("host", F.explode(shingles).alias("sh"))
        # 16-byte digest, not the 32-hex spelling: fp is internal (never
        # output) and only compared for equality, and unhex(md5) is a
        # bijection of md5 — same buckets at half the bytes through the
        # distinct, the checkpoints and the pair grouping (guide §2.3)
        .select("host", F.unhex(F.md5("sh")).alias("fp"))
        .distinct()
    )
    if _capture is not None:
        _capture["q88.shingle_set"] = s_pre
    # s feeds both the hot census and the anti-join; checkpointing it
    # makes the corpus-sized explode+distinct run exactly ONCE (the
    # production form persists the shingle table for reuse anyway)
    s = s_pre.localCheckpoint()
    hot = (
        s.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") > _MIRROR_DF_CAP)
        .select("fp")
    )
    # rare feeds both the pair expansion and the per-host sizes
    rare_pre = s.join(F.broadcast(hot), "fp", "left_anti")
    if _capture is not None:
        _capture["q88.rare_antijoin"] = rare_pre
    rare = rare_pre.localCheckpoint()
    sz = rare.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # pair generation from fp-grouped host buckets instead of a self-join
    # (r6, guide §2.4): the join shuffled `rare` twice (build + probe side
    # of the same exchange) to meet itself on fp; grouping shuffles it
    # ONCE, and the <= cap-sized host list explodes its ordered pairs in a
    # JVM HOF — identical (host_a < host_b, count per pair) output because
    # rows are distinct (host, fp) in both forms
    grp = (
        rare.groupBy("fp")
        .agg(F.sort_array(F.collect_list("host")).alias("hs"))
        .filter(F.size("hs") >= 2)
    )
    pair_structs = F.expr(
        "flatten(transform(hs, (x, i) ->"
        " transform(slice(hs, i + 2, size(hs) - i - 1),"
        " y -> struct(x as host_a, y as host_b))))"
    )
    pairs = (
        grp.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.host_a").alias("host_a"), F.col("p.host_b").alias("host_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    return (
        pairs.join(F.broadcast(sz.withColumnRenamed("host", "host_a")), "host_a")
        .withColumnRenamed("n", "size_a")
        .join(
            F.broadcast(
                sz.withColumnRenamed("host", "host_b").withColumnRenamed("n", "size_b")
            ),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "shared",
            "size_a",
            "size_b",
            (
                F.col("shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------------------ q89
_CONT_SHINGLE = 3


@query(
    "q89_shingle_containment",
    oracle=f"""
    WITH w AS (SELECT doc_id,
                      list_distinct(list_transform(
                        range(1, len(string_split(lower(text), ' ')) - {_CONT_SHINGLE - 2}),
                        j -> string_split(lower(text), ' ')[j] || ' ' ||
                             string_split(lower(text), ' ')[j+1] || ' ' ||
                             string_split(lower(text), ' ')[j+2])) AS sh
               FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS BIGINT) AS inter,
           CAST(len(a.sh) AS BIGINT) AS n_a,
           CAST(len(b.sh) AS BIGINT) AS n_b,
           CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
             / CAST(len(a.sh) AS DOUBLE) AS cont_a_in_b,
           CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
             / CAST(len(b.sh) AS DOUBLE) AS cont_b_in_a
    FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
    """,
)
def q89_shingle_containment(spark, sf_dir):
    """Asymmetric containment (Broder): |A∩B|/|A| and |A∩B|/|B| over
    distinct 3-gram word shingles for neighbor doc pairs —
    the excerpt/quote detector symmetric Jaccard (q26) misses when a
    short doc sits inside a long one.

    Scale shape: identical to q26 — shingle sets stay array-typed inside
    one projection (no shingle explosion, no shuffle of shingle rows),
    the only exchange is the doc_id+1 self-join, and array_intersect
    runs JVM-side per pair. In the production near-dup pipeline the
    pair list comes from q25's capped LSH buckets instead of adjacency;
    adjacency keeps the oracle exact and total."""
    # single-file scan -> 2 tasks; the shingle HOF ran at parallelism 2 on
    # BOTH join sides (measured: 2 tasks x 3.3s CPU = 7.4s wall at 10x).
    # Spread the scan, compute the shingle sets ONCE, and stage them so
    # each join side reads the skinny (doc_id, sh) frame (guide §2.5/§2.4)
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = F.split(F.lower(F.col("text")), " ")
    sh = F.array_distinct(
        F.when(
            F.size(F.col("ws")) >= _CONT_SHINGLE,
            F.expr(
                f"transform(sequence(1, size(ws) - {_CONT_SHINGLE - 1}),"
                f" j -> concat_ws(' ', slice(ws, j, {_CONT_SHINGLE})))"
            ),
        ).otherwise(F.expr("cast(array() as array<string>)"))
    )
    w = (
        d.select("doc_id", ws.alias("ws"))
        .select("doc_id", sh.alias("sh"))
        .localCheckpoint(eager=False)
    )
    a = w.alias("a")
    b = w.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.cast("long").alias("inter"),
        F.size(F.col("a.sh")).cast("long").alias("n_a"),
        F.size(F.col("b.sh")).cast("long").alias("n_b"),
        (inter.cast("double") / F.size(F.col("a.sh")).cast("double")).alias(
            "cont_a_in_b"
        ),
        (inter.cast("double") / F.size(F.col("b.sh")).cast("double")).alias(
            "cont_b_in_a"
        ),
    )


# ------------------------------------------------------------------ q90
_SITEMAP_FANOUT = 3
_SITEMAP_HOSTS = 40


@query(
    "q90_sitemap_discovery",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS nn FROM documents),
    xml AS (
      SELECT d.doc_id,
             '<urlset>' || string_agg(
               '<url><loc>https://h' || CAST(u.tgt % {_SITEMAP_HOSTS} AS VARCHAR) ||
               '.example/p/' || CAST(u.tgt AS VARCHAR) || '</loc></url>',
               '' ORDER BY u.j) || '</urlset>' AS sitemap
      FROM documents d CROSS JOIN n,
           LATERAL (SELECT j,
                           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                                CAST(j AS VARCHAR)), 1, 8) AS BIGINT) % (2 * n.nn) AS tgt
                    FROM (SELECT unnest(range(1, {_SITEMAP_FANOUT + 1})) AS j)) u
      GROUP BY d.doc_id),
    locs AS (SELECT doc_id, unnest(regexp_extract_all(sitemap, '<loc>([^<]+)</loc>', 1)) AS url
             FROM xml),
    agg AS (SELECT url, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_referrers
            FROM locs GROUP BY url),
    seen AS (SELECT 'https://h' || CAST(doc_id % {_SITEMAP_HOSTS} AS VARCHAR) ||
                    '.example/p/' || CAST(doc_id AS VARCHAR) AS url
             FROM documents)
    SELECT a.url, a.n_referrers
    FROM agg a WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.url = a.url)
    """,
)
def q90_sitemap_discovery(spark, sf_dir):
    """Sitemap-driven URL discovery: each page publishes a sitemap XML
    (deterministic md5-fanout targets, half of which fall outside the
    crawled id range), ``<loc>`` entries are pulled with a vectorized
    regex, rolled up per URL with a referrer count, and anti-joined
    against the already-crawled URL set — the discovery feed the J2
    seen anti-join consumes.

    Scale shape: XML synthesis and regexp_extract_all are zero-shuffle
    projections; the per-URL rollup is the only corpus-sized exchange
    (map-side combined on the url key); the seen set joins as a
    shuffled anti-join on the same url key — at frontier scale that
    anti-join is exactly operators/dedup.py's Bloom-prefiltered path
    (prefilter drops the 99% misses before the exchange). Referrer
    count doubles as the discovery-priority signal the frontier ranks
    on (operators/frontier.py)."""
    d = t(spark, sf_dir, "documents")
    n1 = d.agg(F.count(F.lit(1)).alias("nn"))
    # the whole sitemap is ONE projection (transform over the fanout
    # sequence) — no explode, no re-grouping shuffle to assemble the XML
    tgt_sql = (
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':', "
        "cast(j as string))), 1, 8), 16, 10) as bigint) % (2 * nn)"
    )
    xml = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            F.expr(
                "concat('<urlset>', concat_ws('', transform("
                f"sequence(1, {_SITEMAP_FANOUT}), j -> "
                f"concat('<url><loc>https://h', cast(({tgt_sql}) % {_SITEMAP_HOSTS}"
                f" as string), '.example/p/', cast({tgt_sql} as string),"
                " '</loc></url>'))), '</urlset>')"
            ).alias("sitemap"),
        )
    )
    locs = xml.select(
        "doc_id",
        F.explode(F.regexp_extract_all("sitemap", F.lit("<loc>([^<]+)</loc>"), 1)).alias(
            "url"
        ),
    )
    agg = locs.groupBy("url").agg(
        F.countDistinct("doc_id").cast("long").alias("n_referrers")
    )
    seen = d.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % _SITEMAP_HOSTS).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return agg.join(seen, "url", "left_anti")


# ------------------------------------------------------------------ q91
@query(
    "q91_cdx_offset_index",
    oracle="""
    WITH rec AS (
      SELECT source, doc_id,
             'WARC/1.0' || chr(13) || chr(10) ||
             'WARC-Target-URI: https://' || source || '.example.com/d/' ||
               CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ||
             'Content-Length: ' || CAST(n_chars AS VARCHAR) ||
               chr(13) || chr(10) || chr(13) || chr(10) ||
             text || chr(13) || chr(10) || chr(13) || chr(10) AS r
      FROM documents)
    SELECT source AS warc_file, doc_id,
           CAST(COALESCE(SUM(length(r)) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS rec_offset,
           CAST(length(r) AS BIGINT) AS rec_len,
           md5(r) AS digest
    FROM rec
    """,
)
def q91_cdx_offset_index(spark, sf_dir):
    """CDX offset-index build for a WARC-style archive: render each
    page's WARC record (headers + payload), then compute its byte
    offset inside its per-source WARC file as a prefix sum of record
    lengths in doc_id order, plus length and md5 digest — the index
    that makes a Common-Crawl-style archive random-access
    (record = file[offset : offset+len], verifiable by digest).

    Scale shape: record rendering, length, and digest are zero-shuffle
    projections; the offset is ONE window per warc_file — correct
    because real WARC files are size-bounded (~1 GB), so a file's
    records always fit one task; for unbounded virtual files the
    two-level distributed prefix sum (q68, contract/quality.py) is the
    drop-in replacement and is already certified. Only (source, doc_id,
    len) ride the sort exchange conceptually — the rendered record
    text never needs to shuffle since digest/len are computed before
    the window and the window adds no wide columns."""
    d = t(spark, sf_dir, "documents")
    crlf = F.lit("\r\n")
    rec = F.concat(
        F.lit("WARC/1.0"),
        crlf,
        F.lit("WARC-Target-URI: https://"),
        F.col("source"),
        F.lit(".example.com/d/"),
        F.col("doc_id").cast("string"),
        crlf,
        F.lit("Content-Length: "),
        F.col("n_chars").cast("string"),
        crlf,
        crlf,
        F.col("text"),
        crlf,
        crlf,
    )
    sized = d.select(
        F.col("source").alias("warc_file"),
        "doc_id",
        F.length(rec).cast("long").alias("rec_len"),
        F.md5(rec).alias("digest"),
    )
    w = (
        Window.partitionBy("warc_file")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sized.select(
        "warc_file",
        "doc_id",
        F.coalesce(F.sum("rec_len").over(w), F.lit(0)).cast("long").alias("rec_offset"),
        "rec_len",
        "digest",
    )


# ------------------------------------------------------------------ q95
_MIRROR_EDGE_JACC = 0.04  # q88 pairs at/above this Jaccard are mirror edges


@query(
    "q95_mirror_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE {_MIRROR_RARE_SQL},
    sz0 AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n FROM rare GROUP BY host),
    pairs AS (SELECT a.host AS host_a, b.host AS host_b,
                     CAST(COUNT(*) AS BIGINT) AS shared
              FROM rare a JOIN rare b ON b.fp = a.fp AND a.host < b.host
              GROUP BY a.host, b.host),
    mir AS (SELECT p.host_a, p.host_b
            FROM pairs p JOIN sz0 sa ON sa.host = p.host_a
                         JOIN sz0 sb ON sb.host = p.host_b
            WHERE CAST(p.shared AS DOUBLE)
                  / CAST(sa.n + sb.n - p.shared AS DOUBLE)
                  >= {_MIRROR_EDGE_JACC}),
    e AS (SELECT host_a AS a, host_b AS b FROM mir
          UNION SELECT host_b, host_a FROM mir),
    hosts AS (SELECT DISTINCT 'h' || CAST(doc_id % {_MIRROR_HOSTS} AS VARCHAR)
                       AS host FROM documents),
    reach(host, lbl) AS (
      SELECT host, host FROM hosts
      UNION
      SELECT e.a, r.lbl FROM e JOIN reach r ON r.host = e.b),
    lab AS (SELECT host, MIN(lbl) AS cluster FROM reach GROUP BY host),
    sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cn FROM lab GROUP BY cluster)
    SELECT l.host, l.cluster, sz.cn AS cluster_size,
           l.host = l.cluster AS is_canonical
    FROM lab l JOIN sz ON sz.cluster = l.cluster
    """,
)
def q95_mirror_cluster_canonical(spark, sf_dir, _capture=None):
    """Mirror-cluster canonicalization: q88's mirror-host pairs (Jaccard
    >= {th}) become an undirected host graph; connected components are
    computed with ALTERNATING LARGE-STAR / SMALL-STAR (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond" — public
    literature), and each cluster elects its minimum host as canonical.
    The crawl use: every URL on a non-canonical mirror is rewritten to
    the canonical host BEFORE the seen-set check, so a 5-host mirror
    farm costs one fetch budget, not five.

    Why a second CC algorithm next to q50's pointer doubling: pointer
    doubling iterates a LABEL TABLE (great when edges fit after the
    near-dup filter); large/small-star rewrites the EDGE LIST itself,
    never materializes per-node adjacency, keeps the edge count
    monotonically bounded, and converges in O(log n) rounds on any
    graph — the shape that survives a 10^8-host mirror graph whose
    biggest component is web-scale. Each half-round is ONE groupBy-min
    plus ONE co-keyed join of skinny (string, string) rows; the
    fixpoint check is an anti-join (production: an accumulator on the
    emit side). The oracle computes the same components via recursive
    transitive closure and the same min-host election.

    Reference semantic: the reference's per-source allow-lists make
    mirrors impossible by construction (config.py:15-72); an open
    crawl must detect and collapse them (Bharat & Broder 1999).
    """.format(th=_MIRROR_EDGE_JACC)
    pairs = q88_mirror_host_pairs(spark, sf_dir)
    edges = (
        pairs.filter(F.col("jaccard") >= _MIRROR_EDGE_JACC)
        .select(F.col("host_a").alias("a"), F.col("host_b").alias("b"))
        .localCheckpoint()
    )
    if _capture is not None:
        _capture["q95.mirror_edges"] = edges
    hosts = (
        t(spark, sf_dir, "documents")
        .select(
            F.concat(
                F.lit("h"), (F.col("doc_id") % _MIRROR_HOSTS).cast("string")
            ).alias("host")
        )
        .distinct()
    )
    lab = components(edges, hosts)
    sz = lab.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return lab.join(F.broadcast(sz), "cluster").select(
        "host",
        "cluster",
        "cluster_size",
        (F.col("host") == F.col("cluster")).alias("is_canonical"),
    )


# ------------------------------------------------------------------ q125
_REVISIT_REC_BYTES = 64  # cost of a WARC revisit record (header + digest ref)

_REVISIT_ORACLE = f"""
WITH f AS (
  SELECT user_id % 200 AS url_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
d AS (
  SELECT url_id, ts, event_id, cents,
         200 + cents % 1400 AS payload_bytes,
         md5(CAST(cents AS VARCHAR)) AS digest,
         lag(md5(CAST(cents AS VARCHAR)))
           OVER (PARTITION BY url_id ORDER BY ts ASC, event_id ASC) AS prev_digest
  FROM f),
m AS (
  SELECT url_id, payload_bytes,
         CASE WHEN digest = prev_digest THEN 1 ELSE 0 END AS is_revisit,
         CASE WHEN digest = prev_digest THEN {_REVISIT_REC_BYTES}
              ELSE payload_bytes END AS stored_bytes
  FROM d)
SELECT url_id,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(SUM(is_revisit) AS BIGINT) AS n_revisits,
       CAST(SUM(payload_bytes) AS BIGINT) AS raw_bytes,
       CAST(SUM(stored_bytes) AS BIGINT) AS stored_bytes,
       (1000 * CAST(SUM(payload_bytes - stored_bytes) AS BIGINT))
         // CAST(SUM(payload_bytes) AS BIGINT) AS saved_permille
FROM m GROUP BY url_id
"""


@query("q125_warc_revisit_dedup", oracle=_REVISIT_ORACLE)
def q125_warc_revisit_dedup(spark, sf_dir):
    """WARC revisit-record deduplication — the storage-side dedup every
    web archive runs (WARC 1.1 'revisit' record type, WARC-Refers-To /
    WARC-Payload-Digest: when a re-fetch returns payload bytes already
    stored for that URL, write a ~64-byte pointer record instead of the
    payload — public IIPC/ISO 28500 practice). Replays each URL's fetch
    history in (ts, event_id) order, digests each observation, marks a
    fetch a revisit when its digest equals the IMMEDIATELY PRECEDING
    one (the URL-agnostic-by-URL form real crawlers use: the previous
    capture is what the CDX lookup returns), and reports per URL the
    fetch/revisit counts and raw vs stored bytes with integer-permille
    savings.

    Cross-engine determinism: content digest = md5 of the observation
    quantized to integer cents FIRST (doubles are never stringified —
    the engines disagree on double formatting, never on BIGINT);
    synthetic payload size = 200 + cents % 1400, all BIGINT.

    Scale shape: the q82 shape exactly — ONE exchange keyed url_id;
    the lag window and the rollup both ride it. At archive scale this
    key is (url, capture-index) — the CDX ordering q91 already builds —
    so revisit marking is a per-URL sequential pass, embarrassingly
    parallel across URLs; hot URLs are single-list long, not wide.
    Reference semantic: the reference's upload-history dedupe
    (cloud_storage.py:241-279 — md5 identity, skip re-upload) applied
    at the archive layer: same identity-hash idea, but the dedup
    artifact is a revisit RECORD so provenance survives."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.select(
        (F.col("user_id") % 200).alias("url_id"),
        "ts",
        "event_id",
        cents.alias("cents"),
    )
    digest = F.md5(F.col("cents").cast("string"))
    w = Window.partitionBy("url_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    d = f.select(
        "url_id",
        (F.lit(200) + F.col("cents") % 1400).alias("payload_bytes"),
        digest.alias("digest"),
        F.lag(digest).over(w).alias("prev_digest"),
    )
    rv = (F.col("digest") == F.col("prev_digest")).cast("int")
    m = d.select(
        "url_id",
        "payload_bytes",
        F.coalesce(rv, F.lit(0)).alias("is_revisit"),
        F.when(
            F.col("digest") == F.col("prev_digest"), F.lit(_REVISIT_REC_BYTES)
        )
        .otherwise(F.col("payload_bytes"))
        .alias("stored_bytes"),
    )
    return m.groupBy("url_id").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum("is_revisit").cast("long").alias("n_revisits"),
        F.sum("payload_bytes").cast("long").alias("raw_bytes"),
        F.sum("stored_bytes").cast("long").alias("stored_bytes"),
        F.expr(
            "(1000 * sum(payload_bytes - stored_bytes)) div sum(payload_bytes)"
        ).alias("saved_permille"),
    )


# ------------------------------------------------------------------ q134
_COV_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
locs AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
              CAST(u.j AS VARCHAR)), 1, 8) AS BIGINT) % (2 * n.nn) AS tgt
  FROM documents d CROSS JOIN n,
       (SELECT unnest(range(1, {{fanout}})) AS j) u),
declared AS (
  SELECT 'h' || CAST(tgt % {{hosts}} AS VARCHAR) || '.example' AS host,
         tgt, CAST(CASE WHEN tgt < n.nn THEN 1 ELSE 0 END AS BIGINT) AS crawled
  FROM locs CROSS JOIN n),
dh AS (SELECT host,
              CAST(COUNT(*) AS BIGINT) AS n_declared,
              CAST(SUM(crawled) AS BIGINT) AS n_both
       FROM declared GROUP BY host),
ch AS (SELECT 'h' || CAST(doc_id % {{hosts}} AS VARCHAR) || '.example' AS host,
              CAST(COUNT(*) AS BIGINT) AS n_crawled
       FROM documents GROUP BY host)
SELECT COALESCE(dh.host, ch.host) AS host,
       COALESCE(n_declared, 0) AS n_declared,
       COALESCE(n_crawled, 0) AS n_crawled,
       COALESCE(n_both, 0) AS n_both,
       COALESCE(n_declared, 0) - COALESCE(n_both, 0) AS uncrawled_declared,
       COALESCE(n_crawled, 0) - COALESCE(n_both, 0) AS orphan_crawled,
       CASE WHEN COALESCE(n_declared, 0) > 0
            THEN (1000 * COALESCE(n_both, 0)) // n_declared
            ELSE CAST(0 AS BIGINT) END AS coverage_permille
FROM dh FULL OUTER JOIN ch ON ch.host = dh.host
"""


@query(
    "q134_sitemap_coverage_diff",
    oracle=_COV_ORACLE.format(fanout=4, hosts=40),
)
def q134_sitemap_coverage_diff(spark, sf_dir):
    """Sitemap-vs-crawl coverage reconciliation — the audit every
    crawl-ops team runs against webmaster-declared sitemaps (public
    sitemaps.org protocol): per host, how many declared URLs exist, how
    many the crawl actually holds, the overlap, the two deficit
    directions (declared-but-uncrawled = discovery backlog;
    crawled-but-undeclared = orphan pages reachable only by links), and
    declared-coverage in integer permille. Reuses q90's deterministic
    sitemap world: declared targets = md5(doc:j) mod 2N (half point
    beyond the crawled id space by construction), crawled set = the
    documents table itself.

    Scale shape: the sitemap explode collapses to DISTINCT target ids
    (map-side combined), both sides aggregate to per-host counts before
    the FULL OUTER host join — the exchange carries O(hosts) rows, and
    the declared-side distinct is the only URL-sized shuffle (16-byte
    ids). At 10^10 URLs this is exactly the url_seen/anti-join
    partitioning the frontier already maintains (J2), so the audit
    rides existing layout. Reference semantic: the reference trusts its
    per-source API listings completely (base_scraper.py:83-105
    pagination IS its sitemap); an open crawl must reconcile declared
    vs discovered inventory."""
    n1 = t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("nn"))
    d = t(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("j").cast("string"))
    )
    locs = (
        d.crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            "nn",
            F.explode(F.array(*[F.lit(j) for j in range(1, 4)])).alias("j"),
        )
        .select(
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % (2 * F.col("nn")))
            .alias("tgt"),
            "nn",
        )
        .distinct()
    )
    declared = locs.select(
        F.concat(F.lit("h"), (F.col("tgt") % 40).cast("string"), F.lit(".example"))
        .alias("host"),
        F.when(F.col("tgt") < F.col("nn"), 1).otherwise(0).cast("long").alias("crawled"),
    )
    dh = declared.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_declared"), F.sum("crawled").alias("n_both")
    )
    ch = d.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 40).cast("string"), F.lit(".example"))
        .alias("host")
    ).groupBy("host").agg(F.count(F.lit(1)).alias("n_crawled"))
    j = dh.join(ch, "host", "full_outer")
    nd = F.coalesce("n_declared", F.lit(0))
    nc = F.coalesce("n_crawled", F.lit(0))
    nb = F.coalesce("n_both", F.lit(0))
    return j.select(
        "host",
        nd.alias("n_declared"),
        nc.alias("n_crawled"),
        nb.alias("n_both"),
        (nd - nb).alias("uncrawled_declared"),
        (nc - nb).alias("orphan_crawled"),
        F.when(nd > 0, F.expr("(1000 * coalesce(n_both, 0)) div n_declared"))
        .otherwise(F.lit(0).cast("long"))
        .alias("coverage_permille"),
    )


# ------------------------------------------------------------------ q140
# Channel precedence for first-discovery attribution (lower wins): the
# sitemap is the publisher's own declaration, links are found organically.
_DISC_CHANNELS = (("sitemap", 1), ("link", 2))

_ATTR_ORACLE = """
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
link_t AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
              CAST(u.j AS VARCHAR)), 1, 8) AS BIGINT) % n.nn AS tgt
  FROM documents d CROSS JOIN n,
       (SELECT unnest(range(1, 4)) AS j) u),
map_t AS (
  SELECT DISTINCT
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
              CAST(u.j AS VARCHAR)), 1, 8) AS BIGINT) % (2 * n.nn) AS tgt
  FROM documents d CROSS JOIN n,
       (SELECT unnest(range(1, 4)) AS j) u),
ch AS (SELECT 'link' AS channel, 2 AS prec, tgt FROM link_t
       UNION ALL
       SELECT 'sitemap' AS channel, 1 AS prec, tgt FROM map_t),
per AS (SELECT tgt,
               CAST(COUNT(*) AS BIGINT) AS n_channels,
               MIN(prec) AS first_prec
        FROM ch GROUP BY tgt)
SELECT c.channel,
       CAST(COUNT(*) AS BIGINT) AS n_targets,
       CAST(SUM(CASE WHEN p.n_channels = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exclusive,
       CAST(SUM(CASE WHEN p.first_prec = c.prec THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed,
       CAST(SUM(CASE WHEN c.tgt >= n.nn THEN 1 ELSE 0 END) AS BIGINT)
         AS n_uncrawled
FROM ch c JOIN per p ON p.tgt = c.tgt CROSS JOIN n
GROUP BY c.channel
"""


@query("q140_discovery_attribution", oracle=_ATTR_ORACLE)
def q140_discovery_attribution(spark, sf_dir):
    """Discovery-channel attribution — which URL-discovery channel
    actually earns its cost? Every production crawler runs several
    (out-link extraction, sitemap polling, feed/redirect intake) and
    budgets them by UNIQUE yield, not raw volume (public crawl-ops
    practice; the sitemaps literature measures exactly this overlap —
    Schonfeld & Shivakumar, WWW 2009 'Sitemaps: Above and Beyond the
    Crawl of Duty'). Per channel: total distinct targets, targets found
    by NO other channel (exclusive yield), targets ATTRIBUTED to it
    under fixed precedence (sitemap = publisher declaration wins ties,
    then links), and still-uncrawled targets (the forward-looking
    yield). Channels reuse the engine's deterministic worlds: q80's
    link targets, q90's sitemap targets (spanning 2N ids so half the
    declared space is genuinely new).

    Scale shape: each channel collapses to DISTINCT target ids
    map-side; the union groupBy(tgt) is one exchange of 16-byte ids on
    exactly the url_seen partitioning (J2 again — attribution IS a
    seen-set question), and the channel rollup is channels-x-counters
    sized. Reference semantic: the reference has one channel per source
    (its API listing); an open crawl runs many and must know which to
    fund."""
    n1 = t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("nn"))
    d = t(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("j").cast("string"))
    )
    base = d.crossJoin(F.broadcast(n1)).select(
        "doc_id",
        "nn",
        F.explode(F.array(*[F.lit(j) for j in range(1, 4)])).alias("j"),
    )
    hv = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    link_t = base.select((hv % F.col("nn")).alias("tgt"), "nn").distinct()
    map_t = base.select((hv % (2 * F.col("nn"))).alias("tgt"), "nn").distinct()
    ch = link_t.select(
        F.lit("link").alias("channel"), F.lit(2).alias("prec"), "tgt", "nn"
    ).unionByName(
        map_t.select(
            F.lit("sitemap").alias("channel"), F.lit(1).alias("prec"), "tgt", "nn"
        )
    )
    per = ch.groupBy("tgt").agg(
        F.count(F.lit(1)).alias("n_channels"), F.min("prec").alias("first_prec")
    )
    return (
        ch.join(per, "tgt")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_targets"),
            F.sum(F.when(F.col("n_channels") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exclusive"),
            F.sum(F.when(F.col("first_prec") == F.col("prec"), 1).otherwise(0))
            .cast("long")
            .alias("n_attributed"),
            F.sum(F.when(F.col("tgt") >= F.col("nn"), 1).otherwise(0))
            .cast("long")
            .alias("n_uncrawled"),
        )
    )


# ------------------------------------------------------------------ q171
# Hard-negative mining for retrieval training: per query, the top-N
# BM25-scored documents that match some but NOT all query terms. Docs
# matching every term are the weak positives (excluded); the strongest
# partial matches are exactly the "hard negatives" a dual-encoder or
# reranker trains against (BM25-mined negatives, Karpukhin et al. 2020).
_HN_QUERIES = {1: ("vector", "merge"), 2: ("merge", "window"), 3: ("vector", "window")}
_HN_TOPN = 10
_HN_ALL_TERMS = tuple(sorted({w for ts in _HN_QUERIES.values() for w in ts}))

_HN_QMAP_SQL = ", ".join(
    f"({qid}, '{term}', {len(terms)})"
    for qid, terms in _HN_QUERIES.items()
    for term in terms
)
_HN_TERMS_SQL = ", ".join(f"'{w}'" for w in _HN_ALL_TERMS)


@query(
    "q171_bm25_hard_negatives",
    oracle=f"""
    WITH qmap AS (SELECT CAST(query_id AS BIGINT) AS query_id, term,
                         CAST(n_q AS BIGINT) AS n_q
                  FROM (VALUES {_HN_QMAP_SQL}) v(query_id, term, n_q)),
    d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    hits AS (SELECT d.doc_id, u.term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM d, LATERAL (SELECT unnest(ws) AS term) u
             WHERE u.term IN ({_HN_TERMS_SQL})
             GROUP BY d.doc_id, u.term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT q.query_id, q.n_q, h.doc_id,
             CAST(
               ln(CAST(1.0 AS DOUBLE)
                  + (CAST(g.nd - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * ((CAST(h.tf AS DOUBLE) * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
                  / (CAST(h.tf AS DOUBLE)
                     + CAST({_BM25_K1!r} AS DOUBLE)
                       * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                          + CAST({_BM25_B!r} AS DOUBLE)
                            * (CAST(dl.dl AS DOUBLE)
                               / (CAST(g.sum_dl AS DOUBLE) / CAST(g.nd AS DOUBLE))))))
             AS DECIMAL(27,12)) AS s
      FROM hits h JOIN qmap q ON q.term = h.term
                  JOIN df ON df.term = h.term
                  JOIN dl ON dl.doc_id = h.doc_id
                  CROSS JOIN g),
    agg AS (SELECT query_id, doc_id, n_q,
                   CAST(COUNT(*) AS BIGINT) AS n_match_terms,
                   SUM(s) AS score_x
            FROM scored GROUP BY query_id, doc_id, n_q),
    neg AS (SELECT query_id, doc_id, n_match_terms,
                   CAST(score_x AS DOUBLE) AS score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score_x DESC, doc_id ASC) AS rk
            FROM agg WHERE n_match_terms < n_q)
    SELECT query_id, CAST(rk AS BIGINT) AS hard_rank, doc_id,
           n_match_terms, score
    FROM neg WHERE rk <= {_HN_TOPN}
    """,
)
def q171_bm25_hard_negatives(spark, sf_dir, _capture=None):
    """BM25 hard-negative mining (the Karpukhin et al. 2020 / DPR recipe
    re-expressed as a corpus operator): for each training query, docs
    matching EVERY query term are the weak positives, and the top-N
    BM25-scored docs matching SOME but not all terms are emitted as hard
    negatives — the lexically-confusable examples that make a retriever
    actually learn term interaction rather than bag overlap. Emits
    (query_id, hard_rank, doc_id, n_match_terms, score): the training-
    pair manifest a retrieval fine-tune consumes.

    Scale shape: the q87 asymmetry end-to-end — the corpus explode is
    filtered to the query-term union BEFORE any shuffle, so the
    (doc, term) aggregate exchanges only matching postings; the
    query-term map, df census, and (nd, sum_dl) globals are broadcast;
    the per-(query, doc) rollup re-keys postings by an 8-byte pair.
    The per-query top-N is a window PARTITIONED by query_id with
    rk <= N — WindowGroupLimitExec keeps an N-row heap per query per
    task before the exchange, so a 10^5-query mining batch (the
    production shape: queries ARE a table, not a literal) shuffles at
    most queries x N x partitions rows. Scoring is the q87 expression
    verbatim: one identically-parenthesized double cast to
    decimal(27,12), summed exactly, bit-identical across engines.

    Reference analog: none — the reference's search surface is stored
    metadata (enhanced_batch_processor.py:569-584); training-pair
    mining is the retrieval-corpus step this engine adds."""
    qmap = spark.createDataFrame(
        [
            (qid, term, len(terms))
            for qid, terms in _HN_QUERIES.items()
            for term in terms
        ],
        "query_id long, term string, n_q long",
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum(F.size("ws")).cast("long").alias("sum_dl"),
    )
    hits_pre = (
        d.select(
            "doc_id",
            F.size("ws").cast("long").alias("dl"),
            F.explode("ws").alias("term"),
        )
        .filter(F.col("term").isin(*_HN_ALL_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if _capture is not None:
        _capture["q171.postings"] = hits_pre
    hits = hits_pre.localCheckpoint()
    df = hits.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tf_d = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("nd") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("nd").cast("double")
    score = idf * (
        (tf_d * F.lit(_BM25_K1 + 1.0))
        / (
            tf_d
            + F.lit(_BM25_K1)
            * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl))
        )
    )
    scored = (
        hits.join(F.broadcast(qmap), "term")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(g))
        .select(
            "query_id",
            "n_q",
            "doc_id",
            score.cast("decimal(27,12)").alias("s"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id", "n_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_match_terms"),
        F.sum("s").alias("score_x"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_x").desc(), F.col("doc_id").asc()
    )
    return (
        agg.filter(F.col("n_match_terms") < F.col("n_q"))
        .select(
            "query_id",
            F.row_number().over(w).cast("long").alias("hard_rank"),
            "doc_id",
            "n_match_terms",
            F.col("score_x").cast("double").alias("score"),
        )
        .filter(F.col("hard_rank") <= _HN_TOPN)
    )


# ------------------------------------------------------------------ q181
# Retrieval-quality evaluation: nDCG@k + MRR@k of the BM25 ranking
# against deterministic graded qrels (rel = number of query terms the
# doc contains). Position discount weights floor(10^6 / log2(i+1)) are
# computed ONCE in Python and shipped to BOTH engines as integer
# literals — zero runtime transcendentals, bit-identical by construction.
import math as _math  # noqa: E402

# Query 1 and 3 include the RARE term 'dup' (df ~5% vs ~80% for the
# common terms): its high IDF lets a tf=2 partially-relevant doc outrank
# fully-relevant docs, so the BM25 order genuinely DIVERGES from the
# ideal order (ndcg < 1000, first_full_rank > 1 on the fixtures at both
# sf0.001 and sf0.01); query 2 is the all-common-terms contrast whose
# ranking is perfect (ndcg = 1000) — both verdict classes appear.
_IR_QUERIES = {
    1: ("dup", "merge"),
    2: ("vector", "window"),
    3: ("dup", "vector", "window"),
}
_IR_K = 10
_IR_W_MICRO = tuple(
    int(_math.floor(1000000.0 / _math.log2(i + 1))) for i in range(1, _IR_K + 1)
)
_IR_ALL_TERMS = tuple(sorted({w for ts in _IR_QUERIES.values() for w in ts}))

_IR_QMAP_SQL = ", ".join(
    f"({qid}, '{term}', {len(terms)})"
    for qid, terms in _IR_QUERIES.items()
    for term in terms
)
_IR_TERMS_SQL = ", ".join(f"'{w}'" for w in _IR_ALL_TERMS)
_IR_WT_SQL = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_IR_W_MICRO))


@query(
    "q181_retrieval_ndcg_eval",
    oracle=f"""
    WITH qmap AS (SELECT CAST(query_id AS BIGINT) AS query_id, term,
                         CAST(n_q AS BIGINT) AS n_q
                  FROM (VALUES {_IR_QMAP_SQL}) v(query_id, term, n_q)),
    wt AS (SELECT CAST(rk AS BIGINT) AS rk, CAST(w_micro AS BIGINT) AS w_micro
           FROM (VALUES {_IR_WT_SQL}) v(rk, w_micro)),
    d AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    hits AS (SELECT d.doc_id, u.term, CAST(COUNT(*) AS BIGINT) AS tf
             FROM d, LATERAL (SELECT unnest(ws) AS term) u
             WHERE u.term IN ({_IR_TERMS_SQL})
             GROUP BY d.doc_id, u.term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY term),
    scored AS (
      SELECT q.query_id, q.n_q, h.doc_id,
             CAST(
               ln(CAST(1.0 AS DOUBLE)
                  + (CAST(g.nd - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * ((CAST(h.tf AS DOUBLE) * CAST({_BM25_K1 + 1.0!r} AS DOUBLE))
                  / (CAST(h.tf AS DOUBLE)
                     + CAST({_BM25_K1!r} AS DOUBLE)
                       * (CAST({1.0 - _BM25_B!r} AS DOUBLE)
                          + CAST({_BM25_B!r} AS DOUBLE)
                            * (CAST(dl.dl AS DOUBLE)
                               / (CAST(g.sum_dl AS DOUBLE) / CAST(g.nd AS DOUBLE))))))
             AS DECIMAL(27,12)) AS s
      FROM hits h JOIN qmap q ON q.term = h.term
                  JOIN df ON df.term = h.term
                  JOIN dl ON dl.doc_id = h.doc_id
                  CROSS JOIN g),
    agg AS (SELECT query_id, doc_id, n_q,
                   CAST(COUNT(*) AS BIGINT) AS rel,
                   SUM(s) AS score_x
            FROM scored GROUP BY query_id, doc_id, n_q),
    ranked AS (SELECT query_id, doc_id, n_q, rel,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY score_x DESC, doc_id ASC) AS rk
               FROM agg),
    ideal AS (SELECT query_id, rel,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY rel DESC, doc_id ASC) AS rk
              FROM agg),
    dcg AS (SELECT r.query_id,
                   CAST(SUM(r.rel * wt.w_micro) AS BIGINT) AS dcg_micro,
                   MIN(CASE WHEN r.rel = r.n_q THEN r.rk END) AS ffr
            FROM ranked r JOIN wt ON wt.rk = r.rk
            GROUP BY r.query_id),
    idcg AS (SELECT i.query_id,
                    CAST(SUM(i.rel * wt.w_micro) AS BIGINT) AS idcg_micro
             FROM ideal i JOIN wt ON wt.rk = i.rk
             GROUP BY i.query_id),
    nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM agg
             GROUP BY query_id)
    SELECT n.query_id, n.n_rel, d.dcg_micro, i.idcg_micro,
           (1000 * d.dcg_micro) // i.idcg_micro AS ndcg_permille,
           CAST(COALESCE(d.ffr, 0) AS BIGINT) AS first_full_rank,
           CAST(CASE WHEN d.ffr IS NOT NULL THEN 1000000 // d.ffr
                     ELSE 0 END AS BIGINT) AS rr_micro
    FROM nrel n JOIN dcg d ON d.query_id = n.query_id
                JOIN idcg i ON i.query_id = n.query_id
    """,
)
def q181_retrieval_ndcg_eval(spark, sf_dir, _capture=None):
    """Retrieval-quality evaluation — nDCG@{_IR_K} and MRR@{_IR_K}
    (Järvelin & Kekäläinen 2002; standard TREC methodology) of the q87
    BM25 ranking against deterministic graded qrels: rel(q, doc) = the
    number of q's terms the doc contains (1..n_q), the lexical grading a
    self-supervised eval can compute at corpus scale with no human
    labels. Completes the retrieval-eval leg next to q160 (ANN recall),
    q168 (classifier PR sweep) and q171 (hard negatives): per query the
    relevant-doc count, DCG@{_IR_K} and ideal-DCG@{_IR_K} in integer
    micro-units, nDCG in permille, the first fully-relevant rank and its
    reciprocal in micro — all integers. The log2 position discounts are
    floored to micro ONCE at module load and enter BOTH engines as
    {_IR_K} literal integers, so the metric has ZERO runtime
    transcendentals beyond the q87 scoring expression itself (which is
    the established decimal(27,12) idiom).

    Scale shape: the q87/q171 asymmetry — the corpus explode is filtered
    to the query-term union BEFORE any shuffle, the df census and query
    map broadcast, the per-(query, doc) rollup keyed by an 8-byte pair.
    Both rank windows (BM25 order and ideal order) partition by query_id
    with rk <= {_IR_K}: WindowGroupLimitExec keeps {_IR_K}-row heaps per
    task, so a 10^5-query eval batch shuffles queries x k x partitions
    rows, and the discount join is against a BROADCAST {_IR_K}-row
    weight table. Reference analog: none — the reference never measures
    its search surface; an engine that mines training pairs (q171) must
    also report whether its ranker is any good."""
    qmap = spark.createDataFrame(
        [
            (qid, term, len(terms))
            for qid, terms in _IR_QUERIES.items()
            for term in terms
        ],
        "query_id long, term string, n_q long",
    )
    wt = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(_IR_W_MICRO)], "rk long, w_micro long"
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    g = d.agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum(F.size("ws")).cast("long").alias("sum_dl"),
    )
    hits_pre = (
        d.select(
            "doc_id",
            F.size("ws").cast("long").alias("dl"),
            F.explode("ws").alias("term"),
        )
        .filter(F.col("term").isin(*_IR_ALL_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if _capture is not None:
        _capture["q181.postings"] = hits_pre
    hits = hits_pre.localCheckpoint()
    df = hits.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tf_d = F.col("tf").cast("double")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("nd") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("nd").cast("double")
    score = idf * (
        (tf_d * F.lit(_BM25_K1 + 1.0))
        / (
            tf_d
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0 - _BM25_B)
                + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl)
            )
        )
    )
    agg_pre = (
        hits.join(F.broadcast(qmap), "term")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(g))
        .select(
            "query_id",
            "n_q",
            "doc_id",
            score.cast("decimal(27,12)").alias("s"),
        )
        .groupBy("query_id", "doc_id", "n_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rel"),
            F.sum("s").alias("score_x"),
        )
    )
    if _capture is not None:
        _capture["q181.scored_rollup"] = agg_pre
    # feeds both rank windows + the n_rel rollup
    agg = agg_pre.localCheckpoint()
    w_bm = Window.partitionBy("query_id").orderBy(
        F.col("score_x").desc(), F.col("doc_id").asc()
    )
    w_id = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ranked = agg.select(
        "query_id", "n_q", "rel", F.row_number().over(w_bm).cast("long").alias("rk")
    ).filter(F.col("rk") <= _IR_K)
    ideal = agg.select(
        "query_id", "rel", F.row_number().over(w_id).cast("long").alias("rk")
    ).filter(F.col("rk") <= _IR_K)
    dcg = (
        ranked.join(F.broadcast(wt), "rk")
        .groupBy("query_id")
        .agg(
            F.sum(F.col("rel") * F.col("w_micro")).cast("long").alias("dcg_micro"),
            F.min(
                F.when(F.col("rel") == F.col("n_q"), F.col("rk"))
            ).alias("ffr"),
        )
    )
    idcg = (
        ideal.join(F.broadcast(wt), "rk")
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") * F.col("w_micro")).cast("long").alias("idcg_micro"))
    )
    nrel = agg.groupBy("query_id").agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    return (
        nrel.join(dcg, "query_id")
        .join(idcg, "query_id")
        .select(
            "query_id",
            "n_rel",
            "dcg_micro",
            "idcg_micro",
            F.expr("(1000 * dcg_micro) div idcg_micro").alias("ndcg_permille"),
            F.coalesce("ffr", F.lit(0)).cast("long").alias("first_full_rank"),
            F.when(F.col("ffr").isNotNull(), F.expr("1000000 div ffr"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_micro"),
        )
    )
