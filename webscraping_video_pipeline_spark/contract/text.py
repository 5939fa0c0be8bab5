"""Scalar-function pack + text analysis + dedup family on ``documents``
(SURVEY.md §2.8 X1-X16; training-data ops: lang-ID, quality scoring, token
counting, fingerprinting, exact dedup).

Cross-engine note: formulas stick to IEEE +,-,*,/ (correctly rounded in both
engines); no transcendentals (libm results differ by ulps across engines).
Regexes use constructs common to Java regex (Spark) and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.lsh import MINHASH_BUCKET_CAP, SIMHASH_BUCKET_CAP, cap_buckets
from . import query, t


# --------------------------------------------------------------- X1-X7 pack
@query(
    "q16_scalar_pack",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, lang,
             CAST(doc_id % 90 AS VARCHAR) || ':' || lpad(CAST((doc_id*7) % 60 AS VARCHAR), 2, '0') AS dur_str,
             CAST(320 + (doc_id % 8) * 160 AS VARCHAR) || 'x' ||
             CAST(240 + (doc_id % 6) * 120 AS VARCHAR) AS res_str,
             'https://cdn.example.com/v/' || source || '/clip-' || CAST(doc_id AS VARCHAR) || '.mp4' AS url
      FROM documents)
    SELECT doc_id,
           CAST(string_split(dur_str, ':')[1] AS DOUBLE) * 60
             + CAST(string_split(dur_str, ':')[2] AS DOUBLE)               AS duration_s,
           CAST(string_split(res_str, 'x')[1] AS BIGINT)                    AS width,
           CAST(string_split(res_str, 'x')[2] AS BIGINT)                    AS height,
           CAST(string_split(res_str, 'x')[1] AS BIGINT)
             * CAST(string_split(res_str, 'x')[2] AS BIGINT)                AS pixels,
           replace(string_split(url, '/')[len(string_split(url, '/'))], '-', ' ') AS title_slug,
           lower(source) || '_' || CAST(doc_id AS VARCHAR) || '.mp4'        AS filename,
           regexp_replace(url, '^https://', '')                             AS no_scheme,
           CASE WHEN width >= 512 AND height >= 512 THEN TRUE ELSE FALSE END AS hi_res
    FROM (SELECT *,
           CAST(string_split(res_str, 'x')[1] AS BIGINT) AS width,
           CAST(string_split(res_str, 'x')[2] AS BIGINT) AS height FROM d)
    """,
)
def q16_scalar_pack(spark, sf_dir):
    """X1 duration parse (videvo_scraper.py:273-294), X3 'WxH' parse
    (videvo_scraper.py:296-310), X4 title slug (pexels_scraper.py:91),
    X6/X7 filename synthesis (enhanced_batch_processor.py:597-602),
    X8 prefix strip (cloud_storage.py:104-106), F4 resolution predicate
    (resolution_validator.py:56)."""
    d = t(spark, sf_dir, "documents")
    d = d.withColumns(
        {
            "dur_str": F.concat(
                (F.col("doc_id") % 90).cast("string"),
                F.lit(":"),
                F.lpad(((F.col("doc_id") * 7) % 60).cast("string"), 2, "0"),
            ),
            "res_str": F.concat(
                (320 + (F.col("doc_id") % 8) * 160).cast("string"),
                F.lit("x"),
                (240 + (F.col("doc_id") % 6) * 120).cast("string"),
            ),
            "url": F.concat(
                F.lit("https://cdn.example.com/v/"),
                F.col("source"),
                F.lit("/clip-"),
                F.col("doc_id").cast("string"),
                F.lit(".mp4"),
            ),
        }
    )
    dur = F.split(F.col("dur_str"), ":")
    res = F.split(F.col("res_str"), "x")
    urlparts = F.split(F.col("url"), "/")
    width = F.element_at(res, 1).cast("long")
    height = F.element_at(res, 2).cast("long")
    return d.select(
        "doc_id",
        (F.element_at(dur, 1).cast("double") * 60 + F.element_at(dur, 2).cast("double")).alias(
            "duration_s"
        ),
        width.alias("width"),
        height.alias("height"),
        (width * height).alias("pixels"),
        F.regexp_replace(F.element_at(urlparts, -1), "-", " ").alias("title_slug"),
        F.concat(
            F.lower(F.col("source")), F.lit("_"), F.col("doc_id").cast("string"), F.lit(".mp4")
        ).alias("filename"),
        F.regexp_replace(F.col("url"), "^https://", "").alias("no_scheme"),
        ((width >= 512) & (height >= 512)).alias("hi_res"),
    )


# ------------------------------------------------------------ X9/X10 regex
@query(
    "q17_ai_keyword_scan",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '\\b(spark|hash|window|merge)\\b')) AS BIGINT) AS n_flagged,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def q17_ai_keyword_scan(spark, sf_dir):
    """AI-keyword alternation match (X9 — ai_content_validator.py:27-36,
    60-106 word-boundary regex over title+description+tags)."""
    d = t(spark, sf_dir, "documents")
    hit = F.col("text").rlike(r"\b(spark|hash|window|merge)\b")
    return d.groupBy("lang").agg(
        F.count(F.when(hit, 1)).alias("n_flagged"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "q10_context_snippet",
    oracle="""
    SELECT doc_id,
           CASE WHEN strpos(text, 'spark') > 0
                THEN substr(text, GREATEST(1, strpos(text, 'spark') - 20), 20 + 5 + 20)
                ELSE NULL END AS snippet
    FROM documents WHERE strpos(text, 'spark') > 0
    """,
)
def q10_context_snippet(spark, sf_dir):
    """±N-char context snippet around a match (X10 —
    ai_content_validator.py:126-160)."""
    d = t(spark, sf_dir, "documents")
    pos = F.locate("spark", F.col("text"))
    return (
        d.filter(pos > 0)
        .select(
            "doc_id",
            F.substring(F.col("text"), F.greatest(F.lit(1), pos - 20), 45).alias("snippet"),
        )
    )


# ----------------------------------------------------------- dedup family
@query(
    "q20_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q20_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (J2/A5 — the reference's seen-set keyed on
    exact identity, enhanced_batch_processor.py:515-533; md5 identity hash
    X11 — cloud_storage.py:269-279)."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "q28_fingerprint",
    oracle="""
    SELECT CAST(COUNT(DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ')))) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    """,
)
def q28_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (X11 analog of the path:size:mtime identity hash)."""
    d = t(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.agg(
        F.countDistinct(fp).alias("n_distinct"), F.count(F.lit(1)).alias("n_docs")
    )


def _minhash_band_sigs(docs, n_bands: int = 4):
    """(doc_id, band, sig) MinHash band signatures (q25/q50's recipe:
    word-trigram shingles, one md5 per shingle, band b's signature = the
    min of the band's disjoint 8-hex-char md5 slice over all shingles).

    r6 (guide §4.2/§4.5): one mapInPandas stage with a per-task memoized
    md5 table — the corpus draws shingles from a small vocabulary
    (~3*10^4 distinct trigrams vs ~10^6.5 instances at sf1.0), so each
    distinct shingle is hashed once per task instead of once per
    instance; hex slices and mins are byte-identical to the SQL form
    (ASCII lexicographic min), pinned by the q25/q50 oracles."""
    import pandas as pd

    def sig_rows(batches):
        import hashlib

        memo: dict = {}

        def slices(s: str):
            r = memo.get(s)
            if r is None:
                h = hashlib.md5(s.encode("utf-8")).hexdigest()
                r = tuple(h[8 * b : 8 * b + 8] for b in range(n_bands))
                memo[s] = r
            return r

        for pdf in batches:
            ids, bands, sigs = [], [], []
            for doc_id, tx in zip(pdf["doc_id"], pdf["text"]):
                ws = tx.split(" ")
                if len(ws) >= 3:
                    mins = list(slices(" ".join(ws[0:3])))
                    for i in range(1, len(ws) - 2):
                        sl = slices(" ".join(ws[i : i + 3]))
                        for b in range(n_bands):
                            if sl[b] < mins[b]:
                                mins[b] = sl[b]
                else:
                    mins = list(slices(tx))
                for b in range(n_bands):
                    ids.append(doc_id)
                    bands.append(b)
                    sigs.append(mins[b])
            yield pd.DataFrame({"doc_id": ids, "band": bands, "sig": sigs})

    return docs.select("doc_id", "text").mapInPandas(
        sig_rows, schema="doc_id long, band int, sig string"
    )



@query(
    "q25_minhash_lsh_buckets",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN list_transform(
                    range(1, len(string_split(text, ' ')) - 2 + 1),
                    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                         || ' ' || string_split(text, ' ')[i+2])
                  ELSE [text] END AS shingles
      FROM documents),
    hs AS (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM sh),
    sigs AS (
      SELECT doc_id, b.band,
             list_aggregate(list_transform(hs, h -> substr(h, 1 + 8 * b.band, 8)), 'min') AS sig
      FROM hs, (SELECT 0 AS band UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) b),
    ok AS (
      SELECT doc_id, band, sig FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, sig) AS bsz FROM sigs)
      WHERE bsz <= 64)
    SELECT a.doc_id AS doc_a, s2.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_bands
    FROM ok a JOIN ok s2 ON a.band = s2.band AND a.sig = s2.sig AND a.doc_id < s2.doc_id
    GROUP BY a.doc_id, s2.doc_id
    """,
)
def q25_minhash_lsh_buckets(spark, sf_dir):
    """MinHash+LSH near-dup candidates: word-trigram shingles -> per-band
    min-hash signature (md5 keyed by band — identical hex in both engines)
    -> oversize-bucket cap (operators/lsh.py: buckets > 64 docs are
    degenerate content, dropped with an observed metric — keeps the
    self-join's per-bucket pair count bounded by construction) ->
    band-bucket self-join -> candidate pairs. The scale path for the J2
    seen-set when near-dup (not just exact) identity is wanted."""
    # repartition: a single-file parquet scan is one task; the shingle+md5
    # signature stage is the heavy part, so spread it across all cores first
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # band signatures via the memoized-md5 mapInPandas stage (r6; see
    # _minhash_band_sigs — byte-identical to the per-row HOF form)
    sigs_long = _minhash_band_sigs(d)
    sigs_long = cap_buckets(
        sigs_long, ["band", "sig"], MINHASH_BUCKET_CAP, observe_as="q25_bucket_cap"
    )
    a, b = sigs_long.alias("a"), sigs_long.alias("b")
    return (
        a.join(b, ["band", "sig"])  # single shuffle on (band, sig) buckets
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


@query(
    "q26_ngram_jaccard_neighbors",
    oracle="""
    WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(a.ws, x -> list_contains(b.ws, x))) AS DOUBLE)
             / CAST(len(a.ws) + len(b.ws) - len(list_filter(a.ws, x -> list_contains(b.ws, x))) AS DOUBLE)
             AS jaccard
    FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
    """,
)
def q26_ngram_jaccard_neighbors(spark, sf_dir):
    """n-gram (word-set) Jaccard similarity over adjacent doc pairs —
    the pairwise-similarity primitive behind near-dup detection."""
    d = t(spark, sf_dir, "documents")
    w = d.select("doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ws"))
    a, b = w.alias("a"), w.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


@query(
    "q27_simhash16",
    oracle="""
    WITH bits AS (
      SELECT doc_id, j,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       w -> ascii(substr(md5(w), j, 1)) % 2 = 1)) * 2
                       > len(string_split(text, ' '))
                  THEN 1 ELSE 0 END AS bit
      FROM documents, range(1, 17) r(j))
    SELECT doc_id, CAST(SUM(bit * (1 << (j - 1))) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def q27_simhash16(spark, sf_dir):
    """16-bit SimHash variant: bit j is the majority vote of per-word hash
    bits (hash bit = parity of the j-th md5 hex char — identical in both
    engines). SimHash-style near-dup signature (dedup family); the shared
    builder :func:`_simhash16` also feeds q53's neighbor search, so the
    two queries cannot diverge."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return _simhash16(d)


def _simhash16(d):
    """(doc_id, simhash) — the q27 signature, shared by q53."""
    dw = d.select(
        "doc_id",
        F.transform(F.split(F.col("text"), " "), lambda w: F.md5(w)).alias("hs"),
    )

    def bit_pred(j: int):
        return lambda h: F.ascii(F.substring(h, j, 1)) % 2 == 1

    n = F.size(F.col("hs"))
    bits = [
        (F.size(F.filter(F.col("hs"), bit_pred(j))) * 2 > n).cast("long") * (1 << (j - 1))
        for j in range(1, 17)
    ]
    sim = bits[0]
    for b in bits[1:]:
        sim = sim + b
    return dw.select("doc_id", sim.alias("simhash"))


_SIMHASH_SQL = """
      SELECT doc_id, CAST(SUM(bit * (1 << (j - 1))) AS BIGINT) AS simhash
      FROM (
        SELECT doc_id, j,
               CASE WHEN len(list_filter(string_split(text, ' '),
                                         w -> ascii(substr(md5(w), j, 1)) % 2 = 1)) * 2
                         > len(string_split(text, ' '))
                    THEN 1 ELSE 0 END AS bit
        FROM documents, range(1, 17) r(j))
      GROUP BY doc_id
"""


@query(
    "q53_simhash_neighbor_pairs",
    oracle=f"""
    WITH sims AS ({_SIMHASH_SQL}),
    bands AS (
      SELECT doc_id, simhash, b.band,
             CAST((simhash >> (4 * b.band)) & 15 AS BIGINT) AS val
      FROM sims, (SELECT 0 AS band UNION ALL SELECT 1
                  UNION ALL SELECT 2 UNION ALL SELECT 3) b),
    ok AS (
      SELECT doc_id, simhash, band, val FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, val) AS bsz FROM bands)
      WHERE bsz <= 4096),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.simhash AS sa, y.simhash AS sb
      FROM ok x JOIN ok y
        ON x.band = y.band AND x.val = y.val AND x.doc_id < y.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(CAST(xor(sa, sb) AS BIGINT)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(CAST(xor(sa, sb) AS BIGINT)) <= 2
    """,
)
def q53_simhash_neighbor_pairs(spark, sf_dir):
    """SimHash near-dup pairs, candidate-generation -> verification (the
    scale shape completing the SimHash leg like q50/q51 do for MinHash /
    embeddings): the 16-bit signature splits into four 4-bit bands; by
    pigeonhole ANY pair within Hamming distance 3 shares at least one
    band, so the band-bucket join (one shuffle) is a COMPLETE candidate
    generator for the hamming<=2 filter applied after — never all pairs.

    The 4-bit band space is a test-scale toy of the production shape
    (64-bit SimHash, four 16-bit bands -> 65536 buckets of ~corpus/65536
    docs each), so buckets here are corpus-fraction-sized by design; the
    oversize-bucket guard (operators/lsh.py, cap 4096) is therefore a
    degenerate-input guard only — it trips on an adversarial flood of
    constant content (which exact-dedup removes anyway), never on
    ordinary input, preserving the pigeonhole completeness guarantee."""
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sims = _simhash16(d)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), 4 * b).bitwiseAND(F.lit(15))
                for b in range(4)
            ])
        ).alias("band", "val"),
    )
    bands = cap_buckets(
        bands, ["band", "val"], SIMHASH_BUCKET_CAP, observe_as="q53_bucket_cap"
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(y, ["band", "val"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.filter(hamming <= 2)
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
    )


# ------------------------------------------------------------ text analysis
@query(
    "q29_langid_heuristic",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), w -> w IN ('the','a','fast','slow','value'))) AS sc_en,
             len(list_filter(string_split(text, ' '), w -> w IN ('der','die','das','und'))) AS sc_de,
             len(list_filter(string_split(text, ' '), w -> w IN ('le','la','et','est'))) AS sc_fr
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN sc_en >= sc_de AND sc_en >= sc_fr THEN 'en'
                WHEN sc_de >= sc_fr THEN 'de' ELSE 'fr' END AS predicted
    FROM s
    """,
)
def q29_langid_heuristic(spark, sf_dir):
    """Language-ID by marker-word counting (n-gram heuristic family).
    The reference filters by source-declared metadata; a 100-TB webtext
    pipeline needs content-based lang-ID as a cheap pre-extraction gate
    (E2 ordering: cheapest predicates first, validation_pipeline.py:83-100)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")

    def score(markers):
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    sc_en = score(["the", "a", "fast", "slow", "value"])
    sc_de = score(["der", "die", "das", "und"])
    sc_fr = score(["le", "la", "et", "est"])
    return d.select(
        "doc_id",
        "lang",
        F.when((sc_en >= sc_de) & (sc_en >= sc_fr), "en")
        .when(sc_de >= sc_fr, "de")
        .otherwise("fr")
        .alias("predicted"),
    )


@query(
    "q30_quality_score",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
             CAST(n_chars AS DOUBLE) AS nc,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w IN ('the','a','of','and','value','table'))) AS DOUBLE) AS n_stop,
             CAST(len(regexp_extract_all(text, '[.!?,;]')) AS DOUBLE) AS n_punct
      FROM documents)
    SELECT doc_id,
           n_words,
           n_stop / n_words                                  AS stopword_ratio,
           n_punct / n_words                                 AS punct_ratio,
           nc / n_words                                      AS avg_word_len,
           (n_stop / n_words) * 0.4
             + (1.0 - n_punct / n_words) * 0.2
             + (nc / n_words) / 10.0 * 0.4                   AS quality
    FROM s
    """,
)
def q30_quality_score(spark, sf_dir):
    """Quality scoring: length/punctuation/stopword ratios (E2 content
    validation re-expressed for webtext; conjunction-of-validators analog,
    validation_pipeline.py:146-153). IEEE-only arithmetic (no libm)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("double")
    n_stop = F.size(
        F.filter(words, lambda w: w.isin("the", "a", "of", "and", "value", "table"))
    ).cast("double")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?,;]"), F.lit(0))).cast(
        "double"
    )
    nc = F.col("n_chars").cast("double")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        (n_stop / n_words).alias("stopword_ratio"),
        (n_punct / n_words).alias("punct_ratio"),
        (nc / n_words).alias("avg_word_len"),
        (
            (n_stop / n_words) * 0.4
            + (F.lit(1.0) - n_punct / n_words) * 0.2
            + (nc / n_words) / 10.0 * 0.4
        ).alias("quality"),
    )


# ----------------------------------------------------- X2/X5 scalar gaps
@query(
    "q48_duration_tags",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             'PT' || CAST(doc_id % 10 AS VARCHAR) || 'M'
                  || CAST((doc_id * 3) % 60 AS VARCHAR) || 'S' AS dur_iso,
             ' ' || source || ' ,, ' || lang || ' , v'
                  || CAST(doc_id % 5 AS VARCHAR) || ' ,' AS tags_raw
      FROM documents)
    SELECT doc_id,
           CAST(regexp_extract(dur_iso, 'PT(\\d+)M(\\d+)S', 1) AS DOUBLE) * 60
             + CAST(regexp_extract(dur_iso, 'PT(\\d+)M(\\d+)S', 2) AS DOUBLE) AS duration_s,
           array_to_string(list_filter(list_transform(string_split(tags_raw, ','),
                                                      x -> trim(x)), x -> x <> ''), '|') AS tags,
           CAST(len(list_filter(list_transform(string_split(tags_raw, ','),
                                               x -> trim(x)), x -> x <> '')) AS BIGINT) AS n_tags
    FROM s
    """,
)
def q48_duration_tags(spark, sf_dir):
    """X2 ISO-8601 duration parse (reference ``coverr_scraper.py:349-354``:
    ``PT(\\d+)M(\\d+)S`` -> seconds) and X5 tags split/trim/drop-empties
    (``pexels_scraper.py:102``, ``videvo_scraper.py:123``), over synthetic
    dur/tags strings derived from doc_id (same derivation in the oracle).
    Tags joined with '|' for a hashable cross-engine output."""
    d = t(spark, sf_dir, "documents").withColumns(
        {
            "dur_iso": F.concat(
                F.lit("PT"),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("M"),
                ((F.col("doc_id") * 3) % 60).cast("string"),
                F.lit("S"),
            ),
            "tags_raw": F.concat(
                F.lit(" "),
                F.col("source"),
                F.lit(" ,, "),
                F.col("lang"),
                F.lit(" , v"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(" ,"),
            ),
        }
    )
    pat = r"PT(\d+)M(\d+)S"
    dur_s = (
        F.regexp_extract(F.col("dur_iso"), pat, 1).cast("double") * 60
        + F.regexp_extract(F.col("dur_iso"), pat, 2).cast("double")
    )
    tags_arr = F.filter(
        F.transform(F.split(F.col("tags_raw"), ","), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return d.select(
        "doc_id",
        dur_s.alias("duration_s"),
        F.array_join(tags_arr, "|").alias("tags"),
        F.size(tags_arr).cast("long").alias("n_tags"),
    )


# -------------------------------------------------- E2 validation record
def validation_checks():
    """The E2 validator battery as named column predicates (reference
    ``validation_pipeline.py:88-92,146-171`` runs named validators and
    collects per-validator results + a failed list)."""
    words = F.split(F.col("text"), " ")
    return [
        ("length", F.col("n_chars") >= 40),
        ("lang", F.col("lang").isin("en", "de", "fr", "es", "pt")),
        (
            "stopwords",
            F.size(
                F.filter(words, lambda w: w.isin("the", "a", "of", "and", "value", "table"))
            )
            >= 1,
        ),
        ("keyword", ~F.col("text").rlike(r"\bmerge\b")),
    ]


def validation_record(df):
    """E2 — the nested validation-result record: per-validator struct,
    ``failed_validators ARRAY<STRING>`` (declaration order), and the
    conjunction ``validated`` (reference ``validation_pipeline.py:146-171``
    emits exactly this shape per item)."""
    checks = validation_checks()
    failed = F.filter(
        F.array(*[F.when(~expr, F.lit(name)) for name, expr in checks]),
        lambda x: x.isNotNull(),
    )
    validated = checks[0][1]
    for _, expr in checks[1:]:
        validated = validated & expr
    return df.withColumns(
        {
            "validators": F.struct(*[expr.alias(name) for name, expr in checks]),
            "failed_validators": failed,
            "validated": validated,
        }
    )


@query(
    "q49_validation_record",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             n_chars >= 40 AS v_length,
             lang IN ('en','de','fr','es','pt') AS v_lang,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('the','a','of','and','value','table'))) >= 1 AS v_stop,
             NOT regexp_matches(text, '\\bmerge\\b') AS v_kw
      FROM documents)
    SELECT doc_id,
           (v_length AND v_lang AND v_stop AND v_kw) AS validated,
           concat_ws(',',
             CASE WHEN NOT v_length THEN 'length' END,
             CASE WHEN NOT v_lang THEN 'lang' END,
             CASE WHEN NOT v_stop THEN 'stopwords' END,
             CASE WHEN NOT v_kw THEN 'keyword' END) AS failed_csv,
           CAST((CASE WHEN v_length THEN 0 ELSE 1 END)
              + (CASE WHEN v_lang THEN 0 ELSE 1 END)
              + (CASE WHEN v_stop THEN 0 ELSE 1 END)
              + (CASE WHEN v_kw THEN 0 ELSE 1 END) AS BIGINT) AS n_failed
    FROM s
    """,
)
def q49_validation_record(spark, sf_dir):
    """E2 validation-result record flattened for the oracle hash: the engine
    builds the real nested record (:func:`validation_record` — per-validator
    BOOLEAN struct + failed_validators ARRAY<STRING>); the query projects it
    to (validated, csv-joined failed list, count)."""
    d = validation_record(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "validated",
        F.array_join(F.col("failed_validators"), ",").alias("failed_csv"),
        F.size(F.col("failed_validators")).cast("long").alias("n_failed"),
    )


# --------------------------------------- end-to-end LSH dedup pipeline
@query(
    "q50_lsh_dedup_pipeline",
    oracle="""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN list_transform(
                    range(1, len(string_split(text, ' ')) - 2 + 1),
                    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                         || ' ' || string_split(text, ' ')[i+2])
                  ELSE [text] END AS shingles
      FROM documents),
    hs AS (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hs FROM sh),
    sigs AS (
      SELECT doc_id, b.band,
             list_aggregate(list_transform(hs, h -> substr(h, 1 + 8 * b.band, 8)), 'min') AS sig
      FROM hs, (SELECT 0 AS band UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) b),
    ok AS (
      SELECT doc_id, band, sig FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, sig) AS bsz FROM sigs)
      WHERE bsz <= 64),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, s2.doc_id AS doc_b
             FROM ok a JOIN ok s2
               ON a.band = s2.band AND a.sig = s2.sig AND a.doc_id < s2.doc_id),
    w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
    ver AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN w wa ON wa.doc_id = c.doc_a JOIN w wb ON wb.doc_id = c.doc_b
      WHERE CAST(len(list_filter(wa.ws, x -> list_contains(wb.ws, x))) AS DOUBLE)
            / (len(wa.ws) + len(wb.ws) - len(list_filter(wa.ws, x -> list_contains(wb.ws, x))))
            >= 0.7),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM ver
              UNION SELECT doc_b, doc_a FROM ver),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT re.id, e.b FROM reach re JOIN edges e ON e.a = re.r)
    SELECT id AS doc_id,
           CAST(MIN(r) AS BIGINT) AS cluster_id,
           (MIN(r) = id) AS is_keeper
    FROM reach GROUP BY id
    """,
)
def q50_lsh_dedup_pipeline(spark, sf_dir, _capture=None):
    """The full near-dup dedup pipeline a 100 TB training-data job runs:
    MinHash band buckets (q25's candidate generation) -> within-bucket
    Jaccard verification at 0.7 (q26's primitive, but only on candidates —
    never all pairs) -> connected components via iterative min-label
    propagation -> keep-lowest-doc_id per duplicate cluster.

    Scale shape: candidates come from the banded bucket join (one shuffle
    on (band, sig)) with the oversize-bucket cap (operators/lsh.py)
    applied first, so per-bucket pair generation is bounded by
    construction — a degenerate signature (empty/boilerplate/adversarial
    identical docs) costs one observed O(n) count, never an O(n^2) join;
    verification joins word-sets only onto the candidate pairs; label
    propagation iterates O(cluster diameter) times — near-dup clusters
    are tiny, so 2-4 rounds converge; each round is one edge-labels join.
    The oracle computes the same components with a recursive transitive
    closure (mirroring the bucket cap in its `ok` CTE).

    ``_capture``: optional dict the builder fills with its internal
    pre-checkpoint stage frames (candidates / verify / one propagation
    round) so tools/explain_audit.py can audit the stages the final
    plan hides behind localCheckpoint (PLANS.md blind spot, r3 VERDICT)."""
    par = spark.sparkContext.defaultParallelism
    d = t(spark, sf_dir, "documents").repartition(par)
    # band signatures via the memoized-md5 mapInPandas stage (r6; see
    # _minhash_band_sigs — byte-identical to the per-row HOF form)
    sigs_long = _minhash_band_sigs(d)
    sigs_long = cap_buckets(
        sigs_long, ["band", "sig"], MINHASH_BUCKET_CAP, observe_as="q50_bucket_cap"
    )
    a, b = sigs_long.alias("a"), sigs_long.alias("b")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    if _capture is not None:
        _capture["q50.candidates"] = cand
    w = d.select("doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ws"))
    wa = w.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("ws_a"))
    wb = w.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
    union = F.size(F.col("ws_a")) + F.size(F.col("ws_b")) - inter
    verified = (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .filter(inter.cast("double") / union.cast("double") >= 0.7)
        .select("doc_a", "doc_b")
    )
    if _capture is not None:
        _capture["q50.jaccard_verify"] = verified

    # r6 (guide §2.3 — shuffle fewer bytes into the iterative phase):
    # sparsify the verified-edge graph to per-task STAR forests before the
    # propagation loop. Per task, a union-find merges the task's edges,
    # then emits one (min_id, member) star edge per non-min member of each
    # local component: the union of per-task stars has exactly the
    # original connected components (an edge is dropped only when its
    # endpoints are already connected inside the task, and stars reconnect
    # every node the task saw), so the component-min labels the loop
    # computes are unchanged — the standard sparsify/contract step of
    # distributed CC (Rastogi et al. 2013's star operations, public
    # literature). Two passes with shrinking partition counts (the
    # fixture-scale instance of the O(log P) pass schedule; counts derive
    # from defaultParallelism, not constants) take the dense near-dup
    # graph (~20 edges/node here) to ~1 edge/node AND diameter <= 2
    # per surviving component view, so the pointer-doubling loop
    # converges in ~2 rounds instead of O(log diameter) on long chains.
    def _star_forest(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a_, b_ in zip(pdf["doc_a"].tolist(), pdf["doc_b"].tolist()):
                if a_ not in parent:
                    parent[a_] = a_
                if b_ not in parent:
                    parent[b_] = b_
                ra, rb = find(a_), find(b_)
                if ra != rb:
                    parent[rb] = ra
        comp: dict = {}
        for v in parent:
            comp.setdefault(find(v), []).append(v)
        ka, kb = [], []
        for members in comp.values():
            m = min(members)
            for v in members:
                if v != m:
                    ka.append(m)
                    kb.append(v)
        yield pd.DataFrame({"doc_a": ka, "doc_b": kb})

    nspar = max(4, par // 8)
    forest = (
        verified.repartition(nspar)
        .mapInPandas(_star_forest, schema="doc_a long, doc_b long")
        .repartition(max(1, nspar // 4))
        .mapInPandas(_star_forest, schema="doc_a long, doc_b long")
    )
    edges = forest.unionByName(
        forest.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()
    # min-label propagation with POINTER DOUBLING (label <- label of label):
    # plain neighbor-min needs O(diameter) rounds — a chain of near-dups
    # makes that O(cluster size); the jump step halves remaining distance
    # every round, so convergence is O(log diameter) Spark jobs.
    #
    # The loop runs ONLY over nodes incident to a verified edge: a doc
    # with no near-dup edge keeps label = doc_id forever, so iterating it
    # is pure waste — on a real corpus near-dup members are a small
    # fraction, so this shrinks every per-round join from |corpus| to
    # |near-dup nodes| (measured 9.1s -> ~4s at sf0.1). Singletons are
    # re-attached by one left join after the fixpoint.
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()  # edges are symmetric, so doc_a covers every endpoint
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(32):  # 2^32 ≫ any diameter; loop exits on fixpoint
        nbr_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, "doc_id", "left").select(
            "doc_id",
            F.col("label").alias("_old"),  # carried for the fixpoint check
            F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                "label"
            ),
        )
        parent = stepped.select(
            F.col("doc_id").alias("label"), F.col("label").alias("grand")
        )
        # localCheckpoint, NOT persist: the pointer-doubling self-joins
        # double the logical plan every round, so anything that keeps
        # lineage (persist included — it caches data, not the plan) makes
        # analysis cost grow 2^iterations (measured: a 2 GB plan string
        # by round ~8 at sf0.01). Lazy checkpoint + the fixpoint aggregate
        # below = one job per round that both materializes the truncated
        # frame and returns n_changed (_old rode along, so no join against
        # the previous labels either).
        doubled = stepped.join(parent, "label").select(
            "doc_id",
            "_old",
            F.least(F.col("label"), F.col("grand")).alias("label"),
        )
        if _capture is not None and "q50.propagation_round" not in _capture:
            # round 1's frame BEFORE checkpoint truncation: the full
            # edges->nbr_min->jump lineage the final plan never shows
            _capture["q50.propagation_round"] = doubled
        new_labels = doubled.localCheckpoint(eager=False)
        n_changed = (
            new_labels.select(
                F.sum((F.col("label") != F.col("_old")).cast("long")).alias("n")
            ).first()["n"]
            or 0  # sum over zero rows is NULL
        )
        labels = new_labels.drop("_old")
        if n_changed == 0:
            break
    else:
        raise RuntimeError("label propagation did not converge in 32 rounds")
    edges.unpersist()
    # singletons (no near-dup edge) never entered the loop: label = self
    return d.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        (F.col("doc_id") == F.coalesce(F.col("label"), F.col("doc_id"))).alias(
            "is_keeper"
        ),
    )


# -------------------------------------------------- X13 JSON-LD extraction
_Q52_HTML_SQL = """
      SELECT doc_id,
             '<html><head><script type="application/ld+json">{"@type":"VideoObject","name":"clip-'
             || CAST(doc_id AS VARCHAR) || '","duration":"PT' || CAST(doc_id % 10 AS VARCHAR)
             || 'M' || CAST((doc_id * 3) % 60 AS VARCHAR)
             || 'S"}</script><script>var x = 1;</script></head><body><p>p</p></body></html>'
             AS html
      FROM documents
"""


@query(
    "q52_jsonld_extract",
    oracle=f"""
    WITH h AS ({_Q52_HTML_SQL}),
    j AS (SELECT doc_id,
                 regexp_extract(html, '<script type="application/ld\\+json">([^<]*)</script>', 1) AS ld
          FROM h)
    SELECT doc_id,
           json_extract_string(ld, '$.name') AS name,
           CAST(regexp_extract(json_extract_string(ld, '$.duration'), 'PT(\\d+)M(\\d+)S', 1) AS DOUBLE) * 60
             + CAST(regexp_extract(json_extract_string(ld, '$.duration'), 'PT(\\d+)M(\\d+)S', 2) AS DOUBLE)
             AS duration_s,
           CAST(1 AS BIGINT) AS n_blocks
    FROM j
    """,
)
def q52_jsonld_extract(spark, sf_dir):
    """X13 — JSON-LD extraction (reference ``coverr_scraper.py:228-236``
    reads ``script[type=application/ld+json]`` VideoObject metadata):
    synthesize a page per doc, run the real HTML-parser UDF
    (:func:`functions.extract.extract_jsonld`) over the bytes, pull fields
    with get_json_object, and parse the embedded ISO-8601 duration (X2).
    ``n_blocks`` = 1 proves the plain ``<script>`` was NOT captured."""
    from ..functions.extract import extract_jsonld_udf

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit('<html><head><script type="application/ld+json">{"@type":"VideoObject","name":"clip-'),
            F.col("doc_id").cast("string"),
            F.lit('","duration":"PT'),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("M"),
            ((F.col("doc_id") * 3) % 60).cast("string"),
            F.lit('S"}</script><script>var x = 1;</script></head><body><p>p</p></body></html>'),
        ).alias("html"),
    )
    blocks = extract_jsonld_udf(F.encode(F.col("html"), "utf-8"))
    ld = F.element_at(blocks, 1)
    dur = F.get_json_object(ld, "$.duration")
    pat = r"PT(\d+)M(\d+)S"
    return d.select(
        "doc_id",
        F.get_json_object(ld, "$.name").alias("name"),
        (
            F.regexp_extract(dur, pat, 1).cast("double") * 60
            + F.regexp_extract(dur, pat, 2).cast("double")
        ).alias("duration_s"),
        F.size(blocks).cast("long").alias("n_blocks"),
    )


@query(
    "q31_token_counts",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS bpe_ish_tokens
    FROM documents GROUP BY lang
    """,
)
def q31_token_counts(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex tokenizer (training-data
    budgeting — the engine analog of the reference's duration budget A4)."""
    d = t(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))
    )
    return d.groupBy("lang").agg(
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.sum(bpe).cast("long").alias("bpe_ish_tokens"),
    )


# ----------------------------------------------- winnowing fingerprints
@query(
    "q54_winnowing_fingerprints",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 8
                  THEN list_transform(
                    range(1, length(text) - 8 + 2),
                    i -> substr(md5(substr(text, CAST(i AS INT), 8)), 1, 8))
                  ELSE [substr(md5(text), 1, 8)] END AS hs
      FROM documents),
    w AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4
                  THEN list_transform(
                    range(1, len(hs) - 4 + 2),
                    j -> list_aggregate(hs[CAST(j AS INT):CAST(j AS INT) + 3], 'min'))
                  ELSE [list_aggregate(hs, 'min')] END AS fps
      FROM g)
    SELECT doc_id, unnest(list_distinct(fps)) AS fp FROM w
    """,
)
def q54_winnowing_fingerprints(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing, MOSS-style): hash
    every 8-char k-gram, slide a 4-hash window, keep each window's minimum
    — the guarantee is that any match of length >= k + w - 1 chars between
    two documents shares at least one selected fingerprint (property-
    tested by ``tests/test_properties.py``), at ~2/(w+1) the storage of
    all-grams. Output = (doc_id, fp) distinct rows, joinable exactly like
    q26's buckets for plagiarism/near-dup overlap.

    Scale shape: fingerprints are computed per row with no shuffle at all
    (one projection, whole-stage codegen); the overlap self-join downstream
    shuffles only the winnowed ~2/(w+1) subset. 8-hex-char hash prefixes
    compare identically in both engines (fixed-width ASCII), so min() is
    engine-independent.
    """
    # ONE-file fixture scan -> spread the per-doc hashing over every core
    return winnow_fingerprints(
        t(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )


def winnow_fingerprints(docs):
    """(doc_id, fp) winnowing fingerprints of ``docs.text``; k=8, w=4.

    r6 (guide §4.2/§4.5): one mapInPandas stage with a per-task memoized
    md5 table — the corpus re-uses a small vocabulary, so distinct 8-char
    grams are ~10^4 against ~10^7 gram instances and each distinct gram
    is hashed once per task instead of once per instance (the earlier
    per-row array-HOF form paid an interpreted md5 per instance). Hashes
    (md5 hex prefixes) and the w=4 window minima are byte-identical to
    the SQL form, pinned by tests/test_properties.py and the q54 oracle."""
    import pandas as pd

    def fp_rows(batches):
        import hashlib

        memo: dict = {}

        def h8(g: str) -> str:
            r = memo.get(g)
            if r is None:
                r = hashlib.md5(g.encode("utf-8")).hexdigest()[:8]
                memo[g] = r
            return r

        for pdf in batches:
            ids, fps = [], []
            for doc_id, tx in zip(pdf["doc_id"], pdf["text"]):
                if len(tx) >= 8:
                    hs = [h8(tx[i : i + 8]) for i in range(len(tx) - 7)]
                else:
                    hs = [h8(tx)]
                if len(hs) >= 4:
                    out = {min(hs[j : j + 4]) for j in range(len(hs) - 3)}
                else:
                    out = {min(hs)}
                for fp in sorted(out):
                    ids.append(doc_id)
                    fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return docs.select("doc_id", "text").mapInPandas(
        fp_rows, schema="doc_id long, fp string"
    )


# ---------------------------------------------- boilerplate chunk dedup
@query(
    "q57_boilerplate_chunk_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    ch AS (
      SELECT doc_id, j,
             array_to_string(ws[(j-1)*2+1 : LEAST(j*2, len(ws))], ' ') AS chunk
      FROM w, LATERAL (
        SELECT unnest(range(1, CAST(ceil(len(ws) / 2.0) AS INT) + 1)) AS j) _),
    boiler AS (
      SELECT chunk FROM ch GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 10),
    kept AS (
      SELECT c.doc_id, c.j, c.chunk, b.chunk IS NOT NULL AS is_b
      FROM ch c LEFT JOIN boiler b ON b.chunk = c.chunk)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           coalesce(array_to_string(
             list(chunk ORDER BY j) FILTER (WHERE NOT is_b), ' '), '') AS cleaned_text
    FROM kept GROUP BY doc_id
    """,
)
def q57_boilerplate_chunk_dedup(spark, sf_dir):
    """Boilerplate removal by cross-document chunk dedup (the C4/CCNet-style
    cleaning step): split each document into non-overlapping 2-word chunks,
    find chunks occurring in >= 10 DISTINCT documents (site-wide
    boilerplate — nav bars, footers, cookie banners in real crawls), and
    re-emit each document with those chunks removed plus removal counters.

    Scale shape: chunking is a per-row projection (no shuffle); the
    boilerplate census is one map-side-combined groupBy over chunks whose
    distinct result is tiny (frequent chunks only) and BROADCASTS back, so
    the cleaning pass re-scans the corpus with zero additional shuffle —
    at 100 TB the only wide exchange is the chunk census. Deterministic
    output text: chunks are reassembled in position order via
    array_sort(struct(j, chunk)), not collect_list order.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("ws"))
    chunks = F.expr(
        "transform(sequence(1, cast(ceil(size(ws) / 2.0) as int)),"
        " j -> array_join(slice(ws, (j-1)*2 + 1, least(2, size(ws) - (j-1)*2)), ' '))"
    )
    ch = d.select("doc_id", F.posexplode(chunks).alias("j0", "chunk")).select(
        "doc_id", (F.col("j0") + 1).alias("j"), "chunk"
    )
    boiler = (
        ch.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 10)
        .select("chunk", F.lit(True).alias("is_b"))
    )
    kept = ch.join(F.broadcast(boiler), "chunk", "left").withColumn(
        "is_b", F.coalesce(F.col("is_b"), F.lit(False))
    )
    cleaned = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.when(~F.col("is_b"), F.struct("j", "chunk")))
            ),
            lambda s: s["chunk"],
        ),
        " ",
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("is_b").cast("long")).alias("n_boiler"),
        cleaned.alias("cleaned_text"),
    )


@query(
    "q73_simhash64_neardup",
    oracle="""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
    h AS (SELECT doc_id,
                 CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS ha,
                 CAST('0x' || substr(md5(w), 9, 8) AS BIGINT) AS hb
          FROM w),
    c AS (SELECT doc_id, COUNT(*) AS n,
             SUM((ha >> 0) & 1) AS ca0, SUM((hb >> 0) & 1) AS cb0,
             SUM((ha >> 1) & 1) AS ca1, SUM((hb >> 1) & 1) AS cb1,
             SUM((ha >> 2) & 1) AS ca2, SUM((hb >> 2) & 1) AS cb2,
             SUM((ha >> 3) & 1) AS ca3, SUM((hb >> 3) & 1) AS cb3,
             SUM((ha >> 4) & 1) AS ca4, SUM((hb >> 4) & 1) AS cb4,
             SUM((ha >> 5) & 1) AS ca5, SUM((hb >> 5) & 1) AS cb5,
             SUM((ha >> 6) & 1) AS ca6, SUM((hb >> 6) & 1) AS cb6,
             SUM((ha >> 7) & 1) AS ca7, SUM((hb >> 7) & 1) AS cb7,
             SUM((ha >> 8) & 1) AS ca8, SUM((hb >> 8) & 1) AS cb8,
             SUM((ha >> 9) & 1) AS ca9, SUM((hb >> 9) & 1) AS cb9,
             SUM((ha >> 10) & 1) AS ca10, SUM((hb >> 10) & 1) AS cb10,
             SUM((ha >> 11) & 1) AS ca11, SUM((hb >> 11) & 1) AS cb11,
             SUM((ha >> 12) & 1) AS ca12, SUM((hb >> 12) & 1) AS cb12,
             SUM((ha >> 13) & 1) AS ca13, SUM((hb >> 13) & 1) AS cb13,
             SUM((ha >> 14) & 1) AS ca14, SUM((hb >> 14) & 1) AS cb14,
             SUM((ha >> 15) & 1) AS ca15, SUM((hb >> 15) & 1) AS cb15,
             SUM((ha >> 16) & 1) AS ca16, SUM((hb >> 16) & 1) AS cb16,
             SUM((ha >> 17) & 1) AS ca17, SUM((hb >> 17) & 1) AS cb17,
             SUM((ha >> 18) & 1) AS ca18, SUM((hb >> 18) & 1) AS cb18,
             SUM((ha >> 19) & 1) AS ca19, SUM((hb >> 19) & 1) AS cb19,
             SUM((ha >> 20) & 1) AS ca20, SUM((hb >> 20) & 1) AS cb20,
             SUM((ha >> 21) & 1) AS ca21, SUM((hb >> 21) & 1) AS cb21,
             SUM((ha >> 22) & 1) AS ca22, SUM((hb >> 22) & 1) AS cb22,
             SUM((ha >> 23) & 1) AS ca23, SUM((hb >> 23) & 1) AS cb23,
             SUM((ha >> 24) & 1) AS ca24, SUM((hb >> 24) & 1) AS cb24,
             SUM((ha >> 25) & 1) AS ca25, SUM((hb >> 25) & 1) AS cb25,
             SUM((ha >> 26) & 1) AS ca26, SUM((hb >> 26) & 1) AS cb26,
             SUM((ha >> 27) & 1) AS ca27, SUM((hb >> 27) & 1) AS cb27,
             SUM((ha >> 28) & 1) AS ca28, SUM((hb >> 28) & 1) AS cb28,
             SUM((ha >> 29) & 1) AS ca29, SUM((hb >> 29) & 1) AS cb29,
             SUM((ha >> 30) & 1) AS ca30, SUM((hb >> 30) & 1) AS cb30,
             SUM((ha >> 31) & 1) AS ca31, SUM((hb >> 31) & 1) AS cb31
          FROM h GROUP BY doc_id),
    sigs AS (
      SELECT doc_id,
             CAST((CASE WHEN ca0 * 2 > n THEN 1 ELSE 0 END)
               + (CASE WHEN ca1 * 2 > n THEN 2 ELSE 0 END)
               + (CASE WHEN ca2 * 2 > n THEN 4 ELSE 0 END)
               + (CASE WHEN ca3 * 2 > n THEN 8 ELSE 0 END)
               + (CASE WHEN ca4 * 2 > n THEN 16 ELSE 0 END)
               + (CASE WHEN ca5 * 2 > n THEN 32 ELSE 0 END)
               + (CASE WHEN ca6 * 2 > n THEN 64 ELSE 0 END)
               + (CASE WHEN ca7 * 2 > n THEN 128 ELSE 0 END)
               + (CASE WHEN ca8 * 2 > n THEN 256 ELSE 0 END)
               + (CASE WHEN ca9 * 2 > n THEN 512 ELSE 0 END)
               + (CASE WHEN ca10 * 2 > n THEN 1024 ELSE 0 END)
               + (CASE WHEN ca11 * 2 > n THEN 2048 ELSE 0 END)
               + (CASE WHEN ca12 * 2 > n THEN 4096 ELSE 0 END)
               + (CASE WHEN ca13 * 2 > n THEN 8192 ELSE 0 END)
               + (CASE WHEN ca14 * 2 > n THEN 16384 ELSE 0 END)
               + (CASE WHEN ca15 * 2 > n THEN 32768 ELSE 0 END) AS BIGINT) AS b0,
             CAST((CASE WHEN ca16 * 2 > n THEN 1 ELSE 0 END)
               + (CASE WHEN ca17 * 2 > n THEN 2 ELSE 0 END)
               + (CASE WHEN ca18 * 2 > n THEN 4 ELSE 0 END)
               + (CASE WHEN ca19 * 2 > n THEN 8 ELSE 0 END)
               + (CASE WHEN ca20 * 2 > n THEN 16 ELSE 0 END)
               + (CASE WHEN ca21 * 2 > n THEN 32 ELSE 0 END)
               + (CASE WHEN ca22 * 2 > n THEN 64 ELSE 0 END)
               + (CASE WHEN ca23 * 2 > n THEN 128 ELSE 0 END)
               + (CASE WHEN ca24 * 2 > n THEN 256 ELSE 0 END)
               + (CASE WHEN ca25 * 2 > n THEN 512 ELSE 0 END)
               + (CASE WHEN ca26 * 2 > n THEN 1024 ELSE 0 END)
               + (CASE WHEN ca27 * 2 > n THEN 2048 ELSE 0 END)
               + (CASE WHEN ca28 * 2 > n THEN 4096 ELSE 0 END)
               + (CASE WHEN ca29 * 2 > n THEN 8192 ELSE 0 END)
               + (CASE WHEN ca30 * 2 > n THEN 16384 ELSE 0 END)
               + (CASE WHEN ca31 * 2 > n THEN 32768 ELSE 0 END) AS BIGINT) AS b1,
             CAST((CASE WHEN cb0 * 2 > n THEN 1 ELSE 0 END)
               + (CASE WHEN cb1 * 2 > n THEN 2 ELSE 0 END)
               + (CASE WHEN cb2 * 2 > n THEN 4 ELSE 0 END)
               + (CASE WHEN cb3 * 2 > n THEN 8 ELSE 0 END)
               + (CASE WHEN cb4 * 2 > n THEN 16 ELSE 0 END)
               + (CASE WHEN cb5 * 2 > n THEN 32 ELSE 0 END)
               + (CASE WHEN cb6 * 2 > n THEN 64 ELSE 0 END)
               + (CASE WHEN cb7 * 2 > n THEN 128 ELSE 0 END)
               + (CASE WHEN cb8 * 2 > n THEN 256 ELSE 0 END)
               + (CASE WHEN cb9 * 2 > n THEN 512 ELSE 0 END)
               + (CASE WHEN cb10 * 2 > n THEN 1024 ELSE 0 END)
               + (CASE WHEN cb11 * 2 > n THEN 2048 ELSE 0 END)
               + (CASE WHEN cb12 * 2 > n THEN 4096 ELSE 0 END)
               + (CASE WHEN cb13 * 2 > n THEN 8192 ELSE 0 END)
               + (CASE WHEN cb14 * 2 > n THEN 16384 ELSE 0 END)
               + (CASE WHEN cb15 * 2 > n THEN 32768 ELSE 0 END) AS BIGINT) AS b2,
             CAST((CASE WHEN cb16 * 2 > n THEN 1 ELSE 0 END)
               + (CASE WHEN cb17 * 2 > n THEN 2 ELSE 0 END)
               + (CASE WHEN cb18 * 2 > n THEN 4 ELSE 0 END)
               + (CASE WHEN cb19 * 2 > n THEN 8 ELSE 0 END)
               + (CASE WHEN cb20 * 2 > n THEN 16 ELSE 0 END)
               + (CASE WHEN cb21 * 2 > n THEN 32 ELSE 0 END)
               + (CASE WHEN cb22 * 2 > n THEN 64 ELSE 0 END)
               + (CASE WHEN cb23 * 2 > n THEN 128 ELSE 0 END)
               + (CASE WHEN cb24 * 2 > n THEN 256 ELSE 0 END)
               + (CASE WHEN cb25 * 2 > n THEN 512 ELSE 0 END)
               + (CASE WHEN cb26 * 2 > n THEN 1024 ELSE 0 END)
               + (CASE WHEN cb27 * 2 > n THEN 2048 ELSE 0 END)
               + (CASE WHEN cb28 * 2 > n THEN 4096 ELSE 0 END)
               + (CASE WHEN cb29 * 2 > n THEN 8192 ELSE 0 END)
               + (CASE WHEN cb30 * 2 > n THEN 16384 ELSE 0 END)
               + (CASE WHEN cb31 * 2 > n THEN 32768 ELSE 0 END) AS BIGINT) AS b3
      FROM c),
    bands AS (
      SELECT doc_id, b0, b1, b2, b3, b.band,
             CASE b.band WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS val
      FROM sigs, (SELECT 0 AS band UNION ALL SELECT 1
                  UNION ALL SELECT 2 UNION ALL SELECT 3) b),
    ok AS (
      SELECT doc_id, b0, b1, b2, b3, band, val FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, val) AS bsz FROM bands)
      WHERE bsz <= 64),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS nbr
      FROM ok x JOIN ok y ON x.band = y.band AND x.val = y.val AND x.doc_id <> y.doc_id
      WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) <= 3),
    near AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_near FROM cand GROUP BY doc_id)
    SELECT s.doc_id, s.b0, s.b1, s.b2, s.b3,
           CAST(coalesce(n.n_near, 0) AS BIGINT) AS n_near
    FROM sigs s LEFT JOIN near n ON n.doc_id = s.doc_id
    """,
)
def q73_simhash64_neardup(spark, sf_dir):
    """PRODUCTION-width SimHash near-dup (closing r3 verdict gap #1 — q53's
    16-bit/4-bit-band variant self-describes as a test-scale toy): a 64-bit
    signature split into four 16-bit bands, i.e. 65536 buckets per band, so
    bucket size is ~corpus/65536 and the TIGHT oversize cap (64, same as
    MinHash) applies — exactly the shape a 10^10-doc near-dup pass runs.
    By pigeonhole, any pair within Hamming distance 3 agrees on at least
    one of the 4 bands, so the band-bucket self-join is a COMPLETE
    candidate generator for the hamming<=3 filter applied after.

    Signature math (cross-engine identical): per word, 64 hash bits = the
    bits of two 32-bit ints parsed from md5(w) hex (chars 1-8 and 9-16);
    signature bit j is the majority vote over the document's words.
    Counts come from a map-side-combined HASH aggregate over exploded
    (doc_id, ha, hb) rows with 64 integer shift-and-mask sums — every
    expression whole-stage-codegens, and the one exchange carries 65
    longs per doc. (Round-4 rework: the original zero-shuffle
    aggregate()/zip_with fold was interpreted — higher-order functions
    don't codegen — and measured 29.8s at sf0.1 vs 3.9s for this shape (7.6x); a
    64-long hash-agg buffer beats a 64-array per-word allocation loop.)

    Output is per-document (signature bands + neighbor count within
    hamming<=3) so the driver hash-checks the full 64-bit signature of
    every doc, not just the (possibly sparse) near-dup pairs.

    Reference semantic: near-dup identity behind the seen-set
    (/root/reference/processors/enhanced_batch_processor.py:515-519).
    """
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    h = F.md5(F.col("w"))
    hw = words.select(
        "doc_id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("ha"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("hb"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(32):
        aggs.append(
            F.sum(F.shiftright(F.col("ha"), j).bitwiseAND(F.lit(1))).alias(f"ca{j}")
        )
        aggs.append(
            F.sum(F.shiftright(F.col("hb"), j).bitwiseAND(F.lit(1))).alias(f"cb{j}")
        )
    cnts = hw.groupBy("doc_id").agg(*aggs)

    def pack(prefix: str, lo: int):
        expr = None
        for i in range(16):
            bit = (F.col(f"{prefix}{lo + i}") * 2 > F.col("n")).cast("long") * (
                1 << i
            )
            expr = bit if expr is None else expr + bit
        return expr

    sigs = cnts.select(
        "doc_id",
        pack("ca", 0).alias("b0"),
        pack("ca", 16).alias("b1"),
        pack("cb", 0).alias("b2"),
        pack("cb", 16).alias("b3"),
    )
    bands = sigs.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("band", "val"),
    )
    bands = cap_buckets(
        bands, ["band", "val"], MINHASH_BUCKET_CAP, observe_as="q73_bucket_cap"
    )
    x, y = bands.alias("x"), bands.alias("y")
    hd = None
    for k in range(4):
        term = F.bit_count(F.col(f"x.b{k}").bitwiseXOR(F.col(f"y.b{k}")))
        hd = term if hd is None else hd + term
    cand = (
        x.join(y, ["band", "val"])  # one shuffle on the 65536-bucket space
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_id"), F.col("y.doc_id").alias("nbr"), hd.alias("hd"))
        .filter(F.col("hd") <= 3)
        .distinct()
    )
    near = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_near"))
    return sigs.join(near, "doc_id", "left").select(
        "doc_id",
        F.col("b0").cast("long").alias("b0"),
        F.col("b1").cast("long").alias("b1"),
        F.col("b2").cast("long").alias("b2"),
        F.col("b3").cast("long").alias("b3"),
        F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
    )


# ------------------------------------------------------------------ q137
_JT_LINE = 8  # words per pseudo-line (layout unit)

_JT_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
ln AS (SELECT doc_id,
              ws[(b - 1) * {_JT_LINE} + 1 :
                 least(b * {_JT_LINE}, len(ws))] AS lw
       FROM w, LATERAL (SELECT unnest(range(1,
              CAST(ceil(len(ws) / {_JT_LINE}.0) AS BIGINT) + 1)) AS b) _),
f AS (SELECT doc_id,
             CAST(len(lw) AS BIGINT) AS n_words,
             CAST(len(list_filter(lw, x -> x = 'the' OR x = 'a')) AS BIGINT)
               AS stop_n,
             CAST(len(array_to_string(lw, ' ')) AS BIGINT) AS n_chars
      FROM ln),
m AS (SELECT doc_id, n_words, n_chars,
             CASE WHEN stop_n >= 1 THEN 1 ELSE 0 END AS keep
      FROM f)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep = 1 THEN n_words ELSE 0 END) AS BIGINT)
         AS kept_words,
       CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars,
       (1000 * CAST(SUM(1 - keep) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS removed_permille
FROM m GROUP BY doc_id
"""


@query("q137_line_density_boilerplate", oracle=_JT_ORACLE)
def q137_line_density_boilerplate(spark, sf_dir):
    """Line-density main-content extraction — the jusText / Boilerpipe
    family (Pomikalek 2011; Kohlschütter et al. WSDM 2010 — public
    literature): segment each document into fixed layout units
    (8-word pseudo-lines standing in for DOM text blocks), classify
    each unit by STOPWORD DENSITY (natural prose carries function
    words; navigation/boilerplate units don't), keep the good units,
    and report per doc the unit counts, kept words/chars, and the
    removed fraction in permille. This is the WITHIN-doc layout-based
    boilerplate pass that complements q57 (cross-doc chunk census) and
    q70 (within-doc repetition): three orthogonal cleaners a corpus
    pipeline composes.

    Scale shape: ZERO shuffle — the segmentation is a slice/transform
    higher-order program over the row's own token array and the rollup
    is per-doc (map-side local); at 100 TB this runs at scan speed in
    whole-stage codegen next to E1's extraction, exactly where a real
    pipeline puts it. All-BIGINT output.

    Reference semantic: the reference's validators decide keep/drop per
    ITEM (validation_pipeline.py:83-177); web text needs keep/drop per
    REGION of each page — this is that operator."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ws")
    )
    return line_density_metrics(d)


def line_density_metrics(d):
    """q137's per-doc line metrics from a (doc_id, ws) frame — shared with
    q148's single-scan corpus-build composition."""
    ln = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, cast(ceil(size(ws) / {_JT_LINE}.0) as int)),"
                f" b -> slice(ws, (b - 1) * {_JT_LINE} + 1,"
                f" least({_JT_LINE}, size(ws) - (b - 1) * {_JT_LINE})))"
            )
        ).alias("lw"),
    )
    f = ln.select(
        "doc_id",
        F.size("lw").cast("long").alias("n_words"),
        F.expr("size(filter(lw, x -> x = 'the' OR x = 'a'))").cast("long").alias(
            "stop_n"
        ),
        F.length(F.array_join("lw", " ")).cast("long").alias("n_chars"),
    )
    m = f.select(
        "doc_id",
        "n_words",
        "n_chars",
        F.when(F.col("stop_n") >= 1, 1).otherwise(0).alias("keep"),
    )
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_words")).otherwise(0))
        .cast("long")
        .alias("kept_words"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
        F.expr("(1000 * sum(1 - keep)) div count(1)").alias("removed_permille"),
    )


# ---- q178: duplicate-cluster size histogram (dedup savings report) -------
from . import ORACLES as _ORACLES178  # noqa: E402  (q50 must be registered first)


@query(
    "q178_dup_cluster_histogram",
    oracle=f"""
    WITH cc AS ({_ORACLES178["q50_lsh_dedup_pipeline"]}),
    tok AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
            FROM documents),
    per AS (
      SELECT c.cluster_id,
             CAST(COUNT(*) AS BIGINT) AS sz,
             CAST(SUM(t.tk) AS BIGINT) AS tks,
             CAST(SUM(CASE WHEN c.is_keeper THEN t.tk ELSE 0 END) AS BIGINT)
               AS kept_tk
      FROM cc c JOIN tok t ON t.doc_id = c.doc_id
      GROUP BY c.cluster_id)
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_dup_docs,
           CAST(SUM(tks) AS BIGINT) AS n_tokens,
           CAST(SUM(tks - kept_tk) AS BIGINT) AS n_removed_tokens
    FROM per GROUP BY sz
    """,
)
def q178_dup_cluster_histogram(spark, sf_dir):
    """Duplicate-cluster size histogram — the dedup SAVINGS REPORT a
    corpus release publishes next to the dedup itself (Lee et al. 2022
    report exactly this distribution: how much of the corpus sits in
    duplicate clusters of each size, and how many tokens keep-one-per-
    cluster removes). Rolls q50's verified near-dup components up twice:
    per cluster (size, token total, keeper's tokens), then per cluster
    SIZE (cluster count, doc count, duplicate-doc count, token total,
    removed-token total). cluster_size = 1 rows are the untouched
    singleton mass — the report's denominator.

    Scale shape: rides q50's banded/capped candidate generation
    unchanged; on top of it ONE doc-keyed join for token counts and two
    map-side-combined aggregates — the first keyed by cluster_id (output
    <= |clusters|), the second by cluster size (output <= max cluster
    size, i.e. tiny). Nothing here re-touches text or pairs; byte-for-
    byte the same component assignment as certified q50 (same builder
    call), so the histogram is exactly consistent with q166's splits and
    q65's keep decisions."""
    cc = q50_lsh_dedup_pipeline(spark, sf_dir)
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tk")
    )
    per = (
        cc.join(tok, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.sum("tk").alias("tks"),
            F.sum(F.when(F.col("is_keeper"), F.col("tk")).otherwise(0)).alias(
                "kept_tk"
            ),
        )
    )
    return per.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
        (F.sum("sz") - F.count(F.lit(1))).cast("long").alias("n_dup_docs"),
        F.sum("tks").cast("long").alias("n_tokens"),
        F.sum(F.col("tks") - F.col("kept_tk")).cast("long").alias("n_removed_tokens"),
    )


# ------------------------------------------------------------------ q184
# MinHash-LSH banding calibration: measure the S-curve before buying it.
# The (bands, rows-per-band) choice sets BOTH the dedup cost (candidate
# volume) and the miss rate at 100 TB; this sweep measures recall and
# precision of every b x r factorization of one signature against exact
# Jaccard ground truth, on the corpus sample the config decision is
# actually made from (Leskovec/Rajaraman/Ullman, "Mining of Massive
# Datasets" ch. 3 — public literature).
_SCV_H = 12  # signature width (minhashes); every (b, r) below has b*r = 12
_SCV_CONFIGS = [(12, 1), (6, 2), (4, 3), (3, 4), (2, 6), (1, 12)]
_SCV_TAU = 500  # ground-truth Jaccard threshold, permille

_SCV_MH_COLS = ",\n             ".join(
    f"list_aggregate(list_transform(shingles, s -> md5(s || '#{k}')), 'min')"
    f" AS mh{k}"
    for k in range(_SCV_H)
)
_SCV_BAND_ARMS = "\n      UNION ALL\n      ".join(
    f"SELECT doc_id, '{b}x{r}' AS config, {i} AS band, "
    + " || ".join(f"mh{i * r + k}" for k in range(r))
    + " AS key FROM mh"
    for (b, r) in _SCV_CONFIGS
    for i in range(b)
)
_SCV_CFG_VALUES = ", ".join(f"('{b}x{r}', {b}, {r})" for b, r in _SCV_CONFIGS)


@query(
    "q184_lsh_banding_calibration",
    oracle=f"""
    WITH shx AS (
      SELECT doc_id,
             CASE WHEN len(string_split(text, ' ')) >= 3
                  THEN list_transform(
                    range(1, len(string_split(text, ' ')) - 2 + 1),
                    i -> string_split(text, ' ')[i] || ' '
                         || string_split(text, ' ')[i+1] || ' '
                         || string_split(text, ' ')[i+2])
                  ELSE [text] END AS shingles
      FROM documents),
    mh AS (SELECT doc_id, {_SCV_MH_COLS} FROM shx),
    bands AS (
      {_SCV_BAND_ARMS}),
    cand AS (
      SELECT DISTINCT a.config, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.config = b.config AND a.band = b.band AND a.key = b.key
       AND a.doc_id < b.doc_id),
    shd AS (SELECT DISTINCT doc_id, md5(s) AS h
            FROM (SELECT doc_id, unnest(shingles) AS s FROM shx)),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM shd GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS iv
      FROM shd a JOIN shd b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    truth AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.doc_a
      JOIN sizes sb ON sb.doc_id = inter.doc_b
      WHERE (1000 * iv) // (sa.n + sb.n - iv) >= {_SCV_TAU}),
    nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
    cfg AS (SELECT * FROM (VALUES {_SCV_CFG_VALUES})
            AS v(config, n_bands, rows_per_band)),
    cc AS (SELECT config, CAST(COUNT(*) AS BIGINT) AS n_cand
           FROM cand GROUP BY config),
    hh AS (SELECT c.config, CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM cand c JOIN truth t
             ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
           GROUP BY c.config)
    SELECT cfg.config,
           CAST(cfg.n_bands AS BIGINT) AS n_bands,
           CAST(cfg.rows_per_band AS BIGINT) AS rows_per_band,
           COALESCE(cc.n_cand, 0) AS n_candidates,
           COALESCE(hh.n_hits, 0) AS n_hits,
           nt.n_truth AS n_true_pairs,
           (1000 * COALESCE(hh.n_hits, 0)) // GREATEST(nt.n_truth, 1)
             AS recall_permille,
           (1000 * COALESCE(hh.n_hits, 0)) // GREATEST(COALESCE(cc.n_cand, 0), 1)
             AS precision_permille
    FROM cfg LEFT JOIN cc ON cc.config = cfg.config
             LEFT JOIN hh ON hh.config = cfg.config
             CROSS JOIN nt
    """,
)
def q184_lsh_banding_calibration(spark, sf_dir, _capture=None):
    """MinHash-LSH banding calibration sweep — the measurement that picks
    (bands, rows-per-band) BEFORE committing a 10^10-document dedup run
    to it (the S-curve chapter of Mining of Massive Datasets — public
    literature). One {_SCV_H}-wide minhash signature per document
    (word-trigram shingles, q25's recipe; hash k = md5(shingle || '#k'),
    identical hex in both engines), then EVERY factorization b x r =
    {_SCV_H} is banded, self-joined on (band, key), and its distinct
    candidate pairs are scored against exact-Jaccard ground truth
    (shared-shingle census join — inter/union in integer permille, no
    all-pairs scan) at tau = {_SCV_TAU}. Per config: candidate volume,
    hits, recall and precision in permille — many narrow bands = high
    recall / low precision, few wide bands = the opposite; the sweep
    shows exactly where the knee is for THIS corpus.

    Scale shape: calibration runs on a bounded corpus SAMPLE (the
    decision input), so the uncapped band buckets are sample-sized by
    construction; the production run it configures rides q25/q50's
    capped-bucket path. One text scan emits signature + census digests,
    staged once (localCheckpoint, exposed via ``_capture``); every
    output is a COUNT, so candidate/truth/hit pairs are counted inside
    block tasks (numpy packed-pair counting over replicated bucket
    lists) and no pair-grain row ever crosses an exchange (r6 rework —
    the prior shingle self-join shuffled ~10^8 mostly-distinct pair
    rows through a pair-keyed aggregate).

    Reference semantic: the reference dedupes by exact URL string only
    (parallel_scraper_manager.py:214-217, deduplicate_by_url); this is
    the instrument that chooses the near-dup configuration an open
    crawl needs in its place."""
    import pandas as pd

    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    # Signature + census stages via per-task memoized md5 (r6, guide
    # §4.2/§4.5 — the _minhash_band_sigs discipline): each DISTINCT
    # trigram shingle is hashed once per task per key k (~3*10^4 distinct
    # vs ~10^6.5 instances at sf1.0) instead of once per instance in an
    # interpreted HOF; hex values and mins are byte-identical to the SQL
    # form, pinned by the q184 oracle.
    def _doc_shingles(tx: str):
        ws = tx.split(" ")
        if len(ws) >= 3:
            return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        return [tx]

    def sig_rows(batches):
        import hashlib

        import numpy as np

        memo: dict = {}

        def mhs(s: str):
            r = memo.get(s)
            if r is None:
                # 12 per-key minhash DIGESTS (as a (12,2) big-endian
                # uint64 view — integer order == byte order, so numpy
                # minima select the SAME shingle per key as hex-string
                # minima) plus the 16-byte census digest, from one memo
                # hit — the signature and the ground-truth census used to
                # shingle + md5 the corpus in two separate scans (r6: one
                # text scan feeds both; digests instead of the oracle's
                # hex spelling — hex is a monotone bijection, guide §2.3).
                r = (
                    np.frombuffer(
                        b"".join(
                            hashlib.md5(f"{s}#{k}".encode("utf-8")).digest()
                            for k in range(_SCV_H)
                        ),
                        dtype=">u8",
                    ).reshape(_SCV_H, 2),
                    hashlib.md5(s.encode("utf-8")).digest(),
                )
                memo[s] = r
            return r

        maxu = np.uint64(0xFFFFFFFFFFFFFFFF)
        for pdf in batches:
            ids, sigs, sets = [], [], []
            for doc_id, tx in zip(pdf["doc_id"], pdf["text"]):
                sset = {}
                for s in _doc_shingles(tx):
                    if s not in sset:
                        sset[s] = mhs(s)
                rows = list(sset.values())
                # per-key lexicographic minimum over the doc's distinct
                # shingles, vectorized: min hi word, then min lo word
                # among rows attaining it (replaces a per-shingle
                # 12-comparison Python loop)
                M = np.stack([m for m, _ in rows])  # (S, 12, 2)
                hi, lo = M[:, :, 0], M[:, :, 1]
                mhi = hi.min(axis=0)
                mlo = np.where(hi == mhi[None, :], lo, maxu).min(axis=0)
                packed = np.empty((_SCV_H, 2), dtype=">u8")
                packed[:, 0], packed[:, 1] = mhi, mlo
                pb = packed.tobytes()
                ids.append(doc_id)
                sigs.append([pb[16 * k : 16 * k + 16] for k in range(_SCV_H)])
                # ONE blob per doc (16-byte stride), not a list of 16-byte
                # cells: the block stage unpacks it with np.frombuffer, so
                # per-element Python objects never exist on either side of
                # the Arrow boundary (measured 3.2s -> ~0.5s conversion)
                sets.append(b"".join(sorted(dg for _, dg in rows)))
            yield pd.DataFrame({"doc_id": ids, "mh": sigs, "hs": sets})

    # one evaluation feeds the band-bucket grouping AND the block stage
    base = d.select("doc_id", "text").mapInPandas(
        sig_rows, schema="doc_id long, mh array<binary>, hs binary"
    ).localCheckpoint(eager=False)
    mh = base.select("doc_id", "mh")
    if _capture is not None:
        _capture["q184.signatures"] = mh
    # Band buckets for ALL six configs in one exchange (r6 rework, guide
    # §1.2 step 1 / §2.4): the old form ran SIX band self-joins each
    # followed by its own distinct() exchange, and a seventh shingle
    # self-join materialized sum_h f_h^2 (~1.25*10^8 at 10x) pair rows
    # through an exchange + pair-grain hash aggregate whose keys are
    # ~all distinct (measured avg multiplicity 1.1) — 24s of the query's
    # 25s.  Every output of the query is a per-config COUNT, so no pair
    # ever needs to leave a task: group the band keys once (f >= 2 only),
    # replicate the bucket lists and the per-doc census sets to
    # `n_blocks` row-blocks, and let each block count its own rows'
    # pairs in numpy (packed local indices, np.unique) — truth,
    # candidates and hits reduce to 4 integers per (block, config).
    all_keys = []
    for ci, (b, r) in enumerate(_SCV_CONFIGS):
        for i in range(b):
            all_keys.append(
                F.struct(
                    F.lit(ci).alias("cfg"),
                    F.lit(i).alias("band"),
                    F.concat(
                        *[
                            F.element_at(F.col("mh"), i * r + k + 1)
                            for k in range(r)
                        ]
                    ).alias("key"),
                )
            )
    bkeys = mh.select(
        "doc_id", F.explode(F.array(*all_keys)).alias("kk")
    ).select("doc_id", "kk.cfg", "kk.band", "kk.key")
    bbuckets = (
        bkeys.groupBy("cfg", "band", "key")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") >= 2)
        .select("cfg", "ds")
    )
    # Block-counting stage: every output of q184 is a COUNT (per config:
    # candidates, hits; global: truth pairs), so pairs are counted inside
    # tasks and never shuffled.  Each of `n_blocks` tasks receives the
    # full per-doc census sets and the full f>=2 band buckets (a bounded
    # calibration SAMPLE by this query's contract — ~40 MB at 10x, the
    # size class session.py already broadcasts for joins), and counts the
    # pairs OWNED by its block (pair (a,b), a<b, owned by block
    # a % n_blocks): exact-Jaccard truth from per-shingle doc buckets
    # (packed local-index pairs, np.unique multiplicity = |intersection|,
    # integer-permille Jaccard — bit-identical arithmetic to the oracle),
    # candidate counts as distinct packed pairs per config, hits via
    # np.isin against the block's truth pairs.  Output: 4 integers per
    # (block, config); the rollup sums blocks.
    n_cfg = len(_SCV_CONFIGS)
    # one block per shuffle partition: the explicit repartition below pins
    # the exchange so AQE's size-based coalescing cannot pack two blocks
    # onto one task (the block stage is CPU-bound in numpy, not I/O-bound,
    # so size-balanced coalescing halves its parallelism for no benefit)
    n_blocks = spark.sparkContext.defaultParallelism

    def _block_counts(key, pdf):
        import numpy as np

        b_ = int(key[0])
        docs = pdf[pdf["cfg"] == -1]
        doc_ids = docs["doc_id"].to_numpy(np.int64)
        srt = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[srt]
        hs_list = docs["hs"].to_numpy()[srt]
        nd = doc_ids.size
        lens = np.fromiter(
            (len(x) // 16 for x in hs_list), dtype=np.int64, count=nd
        )
        # census buckets via ONE lexsort of the digests viewed as 2*int64
        # (equality of 16-byte digests only — no per-element objects)
        flat = np.frombuffer(b"".join(hs_list), dtype=np.int64).reshape(-1, 2)
        drep = np.repeat(np.arange(nd, dtype=np.int64), lens)
        order = np.lexsort((flat[:, 1], flat[:, 0]))
        f_s = flat[order]
        drep_s = drep[order]
        diff = np.r_[
            True, (f_s[1:, 0] != f_s[:-1, 0]) | (f_s[1:, 1] != f_s[:-1, 1])
        ]
        bnd = np.nonzero(diff)[0]
        own_row = (doc_ids % n_blocks) == b_

        def seg_pairs(vals, run_len):
            # packed (ia * nd + ib) pairs, ia owned and ib > ia (local
            # index order == doc_id order because doc_ids is sorted),
            # emitted for EVERY segment at once: no per-bucket Python
            # loop (measured 12.5s -> ~2s per task).  `vals` is the
            # concatenation of all segments' member indices, `run_len`
            # the segment lengths.
            nrun = run_len.size
            if nrun == 0:
                return np.empty(0, np.int64)
            run_start = np.zeros(nrun, np.int64)
            np.cumsum(run_len[:-1], out=run_start[1:])
            run_id = np.repeat(np.arange(nrun, dtype=np.int64), run_len)
            own_pos = np.nonzero(own_row[vals])[0]
            if own_pos.size == 0:
                return np.empty(0, np.int64)
            reps = run_len[run_id[own_pos]]
            tot = int(reps.sum())
            cum0 = np.zeros(own_pos.size, np.int64)
            np.cumsum(reps[:-1], out=cum0[1:])
            # ragged tile: for each owned row, the index range of its run
            idx = (
                np.arange(tot, dtype=np.int64)
                - np.repeat(cum0, reps)
                + np.repeat(run_start[run_id[own_pos]], reps)
            )
            left = np.repeat(vals[own_pos], reps)
            right = vals[idx]
            m = right > left
            return left[m] * nd + right[m]

        # --- exact-Jaccard truth over the shingle census
        pk = seg_pairs(drep_s, np.diff(np.r_[bnd, drep_s.size]))
        if pk.size:
            u, c = np.unique(pk, return_counts=True)
            ia, ib = u // nd, u % nd
            iv = c.astype(np.int64)
            na, nb = lens[ia], lens[ib]
            truth_packed = u[(1000 * iv) // (na + nb - iv) >= _SCV_TAU]
        else:
            truth_packed = np.empty(0, np.int64)
        n_truth = int(truth_packed.size)

        # --- per-config candidate + hit counts over the band buckets
        out = []
        for ci in range(n_cfg):
            bl = pdf[pdf["cfg"] == ci]["ds"].to_numpy()
            if bl.size:
                run_len = np.fromiter(
                    (len(x) for x in bl), dtype=np.int64, count=bl.size
                )
                members = np.searchsorted(
                    doc_ids, np.concatenate([np.asarray(x, np.int64) for x in bl])
                )
                pk = seg_pairs(members, run_len)
            else:
                pk = np.empty(0, np.int64)
            if pk.size:
                uc = np.unique(pk)
                n_cand = int(uc.size)
                n_hits = int(
                    np.isin(uc, truth_packed, assume_unique=True).sum()
                )
            else:
                n_cand = n_hits = 0
            out.append((ci, n_cand, n_hits, n_truth))
        return pd.DataFrame(
            out, columns=["cfg", "n_cand", "n_hits", "n_truth"]
        )

    blk = F.explode(
        F.array(*[F.lit(i) for i in range(n_blocks)])
    ).alias("blk")
    uni = base.select(
        blk,
        F.lit(-1).alias("cfg"),
        F.col("doc_id"),
        F.col("hs"),
        F.lit(None).cast("array<long>").alias("ds"),
    ).unionByName(
        bbuckets.select(
            blk,
            "cfg",
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("binary").alias("hs"),
            "ds",
        )
    )
    counters = (
        uni.repartition(n_blocks, "blk")
        .groupBy("blk")
        .applyInPandas(
            _block_counts,
            schema="cfg int, n_cand long, n_hits long, n_truth long",
        )
    )
    agg = counters.groupBy("cfg").agg(
        F.sum("n_cand").cast("long").alias("n_cand"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.sum("n_truth").cast("long").alias("n_truth"),
    )
    cfg = spark.createDataFrame(
        [(ci, f"{b}x{r}", b, r) for ci, (b, r) in enumerate(_SCV_CONFIGS)],
        "cfg int, config string, n_bands long, rows_per_band long",
    )
    return (
        cfg.join(agg, "cfg", "left")
        .select(
            "config",
            "n_bands",
            "rows_per_band",
            F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce("n_truth", F.lit(0)).cast("long").alias("n_true_pairs"),
            F.expr(
                "(1000 * coalesce(n_hits, 0)) div greatest(coalesce(n_truth, 0), 1)"
            ).alias("recall_permille"),
            F.expr(
                "(1000 * coalesce(n_hits, 0)) div greatest(coalesce(n_cand, 0), 1)"
            ).alias("precision_permille"),
        )
    )


# ---- q186: soft-dedup training weights (reweight, don't remove) ----------
@query(
    "q186_soft_dedup_weights",
    oracle=f"""
    WITH cc AS ({_ORACLES178["q50_lsh_dedup_pipeline"]}),
    tok AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
            FROM documents),
    sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
           FROM cc GROUP BY cluster_id)
    SELECT c.doc_id,
           CAST(c.cluster_id AS BIGINT) AS cluster_id,
           sz.sz AS cluster_size,
           t.tk AS n_tokens,
           1000000 // sz.sz AS weight_micro,
           (1000000 * t.tk) // sz.sz AS eff_tokens_micro,
           CAST(CASE WHEN c.is_keeper THEN t.tk ELSE 0 END AS BIGINT)
             AS hard_kept_tokens
    FROM cc c JOIN sz USING (cluster_id) JOIN tok t USING (doc_id)
    """,
)
def q186_soft_dedup_weights(spark, sf_dir):
    """Soft deduplication: keep EVERY document but down-weight duplicate
    clusters to unit total mass — per doc the sampling weight 1/|cluster|
    in exact integer micro (SoftDedup, He et al. ACL 2024: reweighting
    duplicated data beats removing it for LM pre-training; also the
    "duplication count as loss weight" practice in public corpus
    recipes). Rides q50's VERIFIED near-dup components byte-for-byte
    (same builder call — the q178 discipline), so the weights are
    exactly consistent with the published histogram (q178) and the
    hard-dedup keep decisions (q65): per doc its cluster, cluster size,
    token count, weight_micro = 10^6 div size, effective token mass
    (10^6 * tokens) div size, and the hard-dedup contrast column
    (keeper's tokens or 0) — SUM(eff_tokens_micro)/10^6 vs
    SUM(hard_kept_tokens) is the soft-vs-hard effective-corpus-size
    comparison a training-mix designer reads off this table.

    Scale shape: on top of q50's banded/capped candidate generation —
    ONE cluster-keyed count aggregate (output <= |clusters|, map-side
    combined), joined back on cluster_id, plus one doc-keyed join for
    token counts; all arithmetic integer div, no windows, no new
    corpus-sized exchange. Reference semantic: the reference drops exact
    repeats at upload (enhanced_batch_processor.py:515-533) — removal
    only; soft weighting is the corpus-pipeline upgrade removal can't
    express."""
    cc = q50_lsh_dedup_pipeline(spark, sf_dir)
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tk")
    )
    sz = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        cc.join(sz, "cluster_id")
        .join(tok, "doc_id")
        .select(
            "doc_id",
            F.col("cluster_id").cast("long").alias("cluster_id"),
            "cluster_size",
            F.col("tk").alias("n_tokens"),
            F.expr("1000000 div cluster_size").alias("weight_micro"),
            F.expr("(1000000 * tk) div cluster_size").alias("eff_tokens_micro"),
            F.when(F.col("is_keeper"), F.col("tk"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("hard_kept_tokens"),
        )
    )


# ------------------------------------------------------------------ q194
_BBIT_K = 16  # independent min-wise permutations
_BBIT_B = 2  # stored bits per permutation (sketch = k*b = 32 bits/doc)

_BBIT_ORACLE = f"""
WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
           FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
mh AS (SELECT doc_id, i,
              MIN(md5(CAST(i AS VARCHAR) || ':' || word)) AS mh
       FROM tok, range(0, {_BBIT_K}) r(i) GROUP BY doc_id, i),
sk AS (SELECT doc_id, i,
              (strpos('0123456789abcdef', substr(mh, 32, 1)) - 1) % 4 AS bit2
       FROM mh),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(len(list_filter(a.ws, x -> list_contains(b.ws, x)))
                      AS BIGINT) AS inter,
                 CAST(len(a.ws) + len(b.ws)
                      - len(list_filter(a.ws, x -> list_contains(b.ws, x)))
                      AS BIGINT) AS uni
          FROM w a JOIN w b ON b.doc_id = a.doc_id + 1),
m AS (SELECT p.doc_a, p.doc_b, p.inter, p.uni,
             CAST(SUM(CASE WHEN sa.bit2 = sb.bit2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS matches
      FROM pairs p
      JOIN sk sa ON sa.doc_id = p.doc_a
      JOIN sk sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
      GROUP BY p.doc_a, p.doc_b, p.inter, p.uni)
SELECT doc_a, doc_b, matches,
       GREATEST(CAST(0 AS BIGINT),
                (1000 * (4 * matches - {_BBIT_K})) // (3 * {_BBIT_K}))
         AS est_permille,
       (1000 * inter) // uni AS exact_permille,
       ABS(GREATEST(CAST(0 AS BIGINT),
                    (1000 * (4 * matches - {_BBIT_K})) // (3 * {_BBIT_K}))
           - (1000 * inter) // uni) AS err_permille
FROM m
"""


@query("q194_bbit_minhash_estimate", oracle=_BBIT_ORACLE)
def q194_bbit_minhash_estimate(spark, sf_dir):
    """b-bit minwise hashing (Li & Konig, WWW 2010 / CACM 2011 — public
    literature): store only the lowest {b} bits of each of {k} min-wise
    hash values, so a document's similarity sketch is {k}x{b} = 32 BITS
    (4 bytes) instead of q25's {k}x64 — the 16x storage compaction that
    lets a 10^10-doc near-dup index live in cluster memory. Collisions
    on truncated bits inflate agreement, so the estimator de-biases:
    E[C] = r + (1-r)J with r = 2^-{b}, hence J-hat = (4C - 1)/3 at
    {b} = 2 bits — emitted as integer permille, clamped at 0, next to
    the EXACT word-set Jaccard (q26's pair frame) and the absolute
    error: the measured accuracy/storage trade of the compacted
    sketch, on the same adjacent-pair spine q26 certifies (fixture
    spread 0.19-1.0, so the estimator is exercised across the range —
    not just at the extremes).

    Scale shape: the sketch build is ONE map-side-combined (doc, perm)
    MIN exchange over the {k}-way permutation fan-out of the distinct-
    word explode (hash-keyed, uniform BY CONSTRUCTION — md5 keys);
    the pair evaluation joins two {k}-row sketch slices per candidate
    pair — at production scale candidates come from q25's capped LSH
    buckets and the sketch join replaces the full-signature verify,
    touching 4 bytes/doc where q25/q26 touch the text. All integer
    permille; md5 hex is identical in both engines. Reference
    semantic: none — the reference dedups by exact video id
    (metadata_db lookups); corpus-scale near-dup needs sketches that
    fit in RAM, and b-bit minwise is the public-literature answer.
    """
    d = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    w = d.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ws")
    ).localCheckpoint(eager=False)  # read by the sketch build AND the pair frame
    tok = w.select("doc_id", F.explode("ws").alias("word"))
    perms = tok.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(_BBIT_K)])).alias("i"),
        "word",
    )
    mh = perms.groupBy("doc_id", "i").agg(
        F.min(F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("word"))))
        .alias("mh")
    )
    sk = mh.select(
        "doc_id",
        "i",
        (F.expr("instr('0123456789abcdef', substr(mh, 32, 1)) - 1") % 4).alias(
            "bit2"
        ),
    )
    a, b = w.alias("a"), w.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws"))).cast("long")
    pairs = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("inter"),
            (
                F.size(F.col("a.ws")).cast("long")
                + F.size(F.col("b.ws")).cast("long")
                - inter
            ).alias("uni"),
        )
    )
    sa = sk.select(
        F.col("doc_id").alias("doc_a"), F.col("i"), F.col("bit2").alias("ba")
    )
    sb = sk.select(
        F.col("doc_id").alias("doc_b"), F.col("i"), F.col("bit2").alias("bb")
    )
    m = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "i"])
        .groupBy("doc_a", "doc_b", "inter", "uni")
        .agg(
            F.sum(F.when(F.col("ba") == F.col("bb"), 1).otherwise(0))
            .cast("long")
            .alias("matches")
        )
    )
    est = F.expr(
        f"greatest(cast(0 as bigint),"
        f" (1000 * (4 * matches - {_BBIT_K})) div (3 * {_BBIT_K}))"
    )
    exact = F.expr("(1000 * inter) div uni")
    return m.select(
        "doc_a",
        "doc_b",
        "matches",
        est.alias("est_permille"),
        exact.alias("exact_permille"),
        F.abs(est - exact).alias("err_permille"),
    )


q194_bbit_minhash_estimate.__doc__ = q194_bbit_minhash_estimate.__doc__.replace(
    "{k}", str(_BBIT_K)
).replace("{b}", str(_BBIT_B))
