"""Redirect-chain resolution (round 4, session 6): collapse HTTP 301/302
chains to their terminal URLs BEFORE frontier admission — the reference
follows redirects one hop at a time inside each fetch worker
(yt-dlp/requests default `allow_redirects` behavior in its downloader
calls); at 10^10 URLs the redirect map is itself a table, and resolving
it is a graph problem, not a per-fetch loop:

- **q104 pointer-doubling redirect resolution**: every URL either
  redirects to exactly one target or is terminal (a FUNCTIONAL graph:
  out-degree <= 1). Resolve each URL to its terminal in O(log H) rounds
  of self-join — after round k every row knows its 2^k-step successor
  and the exact hop count — with the industry-standard chain cap
  (browsers stop around 20 redirects; we cap at H = 32 = 2^5 so the cap
  is exactly 5 doubling rounds). Chains longer than the cap and redirect
  CYCLES (a.com -> b.com -> a.com, the classic crawler trap) come out
  with resolved = false and cur = the node exactly 32 hops along, which
  the doubling construction reproduces bit-exactly.

Cross-engine determinism: all-BIGINT rank arithmetic; the synthetic
redirect function dst(r) = (31*r + 17) mod n over node RANKS (terminal
iff r % 7 == 0) is the same closed form in both engines; no floats
anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

_CAP_LOG2 = 5  # hop cap = 2^5 = 32 (browsers give up near 20)
_NODE_MOD = 4096  # synthetic URL-id space dial
_TERM_MOD = 7  # rank % 7 == 0 -> terminal (no redirect)

_REDIR_ORACLE = f"""
WITH RECURSIVE
ids AS (SELECT DISTINCT event_id % {_NODE_MOD} AS nid FROM events),
rk AS (SELECT nid, ROW_NUMBER() OVER (ORDER BY nid) - 1 AS r FROM ids),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rk),
walk(r, cur, hops, done) AS (
  SELECT rk.r,
         CASE WHEN rk.r % {_TERM_MOD} = 0 THEN rk.r
              ELSE (31 * rk.r + 17) % g.n END,
         CAST(CASE WHEN rk.r % {_TERM_MOD} = 0 THEN 0 ELSE 1 END AS BIGINT),
         CASE WHEN rk.r % {_TERM_MOD} = 0 THEN TRUE
              ELSE ((31 * rk.r + 17) % g.n) % {_TERM_MOD} = 0 END
  FROM rk CROSS JOIN g
  UNION ALL
  SELECT w.r, (31 * w.cur + 17) % g.n, w.hops + 1,
         ((31 * w.cur + 17) % g.n) % {_TERM_MOD} = 0
  FROM walk w CROSS JOIN g
  WHERE NOT w.done AND w.hops < {1 << _CAP_LOG2}
),
fin AS (SELECT r, cur, hops, done,
               ROW_NUMBER() OVER (PARTITION BY r ORDER BY hops DESC) AS rn
        FROM walk)
SELECT 'u' || CAST(s.nid AS VARCHAR) AS url,
       'u' || CAST(c.nid AS VARCHAR) AS final_url,
       f.hops,
       f.done AS resolved
FROM fin f JOIN rk s ON s.r = f.r JOIN rk c ON c.r = f.cur
WHERE f.rn = 1
"""


@query("q104_redirect_resolution", oracle=_REDIR_ORACLE)
def q104_redirect_resolution(spark, sf_dir, _capture=None):
    """Resolve every URL's redirect chain to its terminal URL by pointer
    doubling: 5 self-joins (2^5 = 32-hop cap) instead of a 32-step
    sequential walk. State per URL = (rank, cur, hops, done); one round
    composes the map with itself — rows already done pass through, rows
    not done jump to their cur's known successor and ADD the exact hop
    counts, so finished rows always carry the true chain length and
    never-finished rows carry exactly 32 hops and the node 32 steps
    along (cycles/crawler traps surface as resolved = false, matching
    the oracle's step-by-step recursive walk bit-for-bit).

    Scale shape: the redirect map is O(#redirecting URLs), not
    O(corpus) — each round is ONE equi-join of that skinny table with
    itself on cur == rank (hash-partitioned both sides, ~40-byte rows)
    plus a projection; 10^10 URLs resolve in 5 such joins, each
    localCheckpoint-staged so Catalyst never re-derives prior rounds.
    The rank assignment's global window runs over the DISTINCT node-id
    space ({_NODE_MOD} here — a dial), not the corpus; at web scale
    ranks come free from the URL-id assignment itself (xxhash64 ids),
    so that stage disappears entirely. Reference analog: per-fetch
    sequential redirect following inside each worker loop — here the
    whole map resolves as one bounded-depth dataflow before the
    frontier's seen-join ever sees a duplicate alias.
    """
    ids = (
        t(spark, sf_dir, "events")
        .select((F.col("event_id") % _NODE_MOD).alias("nid"))
        .distinct()
    )
    # constant-sized window (node-id space, not corpus) — see docstring
    rk = ids.select(
        "nid", (F.row_number().over(Window.orderBy("nid")) - 1).alias("r")
    )
    n1 = rk.agg(F.count(F.lit(1)).alias("n"))
    rk = rk.localCheckpoint(eager=False)
    term = F.col("r") % _TERM_MOD == 0
    nxt = (31 * F.col("r") + 17) % F.col("n")
    st = rk.crossJoin(F.broadcast(n1)).select(
        "r",
        F.when(term, F.col("r")).otherwise(nxt).alias("cur"),
        F.when(term, 0).otherwise(1).cast("long").alias("hops"),
        F.when(term, F.lit(True)).otherwise(nxt % _TERM_MOD == 0).alias("done"),
    )
    st = st.repartition("r").localCheckpoint(eager=False)
    for _it in range(_CAP_LOG2):
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
        if _capture is not None:
            _capture[f"q104.iter{_it}"] = st
        st = st.localCheckpoint(eager=False)
    src = rk.select(F.col("nid").alias("src_nid"), F.col("r").alias("r"))
    dst = rk.select(F.col("nid").alias("dst_nid"), F.col("r").alias("cur"))
    return (
        st.join(src, "r")
        .join(dst, "cur")
        .select(
            F.concat(F.lit("u"), F.col("src_nid").cast("string")).alias("url"),
            F.concat(F.lit("u"), F.col("dst_nid").cast("string")).alias("final_url"),
            "hops",
            F.col("done").alias("resolved"),
        )
    )


# ------------------------------------------------------------------ q112
_TPL_MIN_URLS = 20  # a template this populous is a URL *family*

_TPL_ORACLE = f"""
WITH u AS (
  SELECT 'example.com/c' || CAST(event_id % 5 AS VARCHAR)
         || '/item/' || CAST(event_id % 97 AS VARCHAR)
         || CASE WHEN event_id % 4 = 0
                 THEN '/rev/' || CAST(event_id % 13 AS VARCHAR)
                 ELSE '' END AS url
  FROM events),
tpl AS (SELECT url, regexp_replace(url, '[0-9]+', '<n>', 'g') AS template
        FROM u),
agg AS (SELECT template,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct,
               MIN(url) AS sample_url
        FROM tpl GROUP BY template)
SELECT template, n_urls, n_distinct, sample_url,
       n_urls >= {_TPL_MIN_URLS} AS is_family
FROM agg
"""


@query("q112_url_path_templates", oracle=_TPL_ORACLE)
def q112_url_path_templates(spark, sf_dir):
    """URL path templating: generalize every numeric path segment to
    <n> (regexp_replace on the digit class — the one regex feature with
    identical semantics in every engine) and aggregate per template —
    URL FAMILIES ('/c<n>/item/<n>') with counts, distinct-URL counts,
    and a deterministic sample. Families above the threshold feed the
    frontier's shape-level controls: per-family crawl budgets, trap
    suspicion (q81 scores hosts; this scores path SHAPES), and the
    C1-adjacent insight that a million /item/<n> URLs are one template,
    not a million decisions. Sibling of q97's DUST parameter rules —
    q97 learns which query params to STRIP, this clusters PATH shapes.

    Scale shape: template derivation is a zero-shuffle projection
    (whole-stage codegen, no backtracking — a character-class scan);
    the groupBy ships only (template, url) and map-side combines; at
    10^10 URLs the template table is orders of magnitude smaller than
    the URL table (that compression IS the point). Counts BIGINT;
    sample = MIN(url), a total order.
    """
    ev = t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("example.com/c"),
        (F.col("event_id") % 5).cast("string"),
        F.lit("/item/"),
        (F.col("event_id") % 97).cast("string"),
        F.when(
            F.col("event_id") % 4 == 0,
            F.concat(F.lit("/rev/"), (F.col("event_id") % 13).cast("string")),
        ).otherwise(F.lit("")),
    )
    tpl = ev.select(url.alias("url")).select(
        "url", F.regexp_replace("url", "[0-9]+", "<n>").alias("template")
    )
    return tpl.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").alias("n_distinct"),
        F.min("url").alias("sample_url"),
        (F.count(F.lit(1)) >= _TPL_MIN_URLS).alias("is_family"),
    )


# ------------------------------------------------------------------ q189
_TRAP_HOSTS = 40  # synthetic host-id space dial
_TRAP_MOD = 8  # hid % 8 == 0 -> host is a planted trap
_TRAP_PATHS = 201  # non-trap path-key space (coprime with 40)
_TRAP_CONTENT = 11  # trap hosts collapse content to this many pages
_TRAP_RATIO = 2  # n_urls >= 2 * n_content -> flag

_TRAP_ORACLE = f"""
WITH p AS (
  SELECT 'h' || CAST(event_id % {_TRAP_HOSTS} AS VARCHAR) AS host,
         CASE WHEN (event_id % {_TRAP_HOSTS}) % {_TRAP_MOD} = 0
              THEN 'h' || CAST(event_id % {_TRAP_HOSTS} AS VARCHAR)
                   || '/p' || CAST((event_id % {_TRAP_PATHS}) % {_TRAP_CONTENT} AS VARCHAR)
                   || '?sid=' || CAST(event_id // {_TRAP_HOSTS} AS VARCHAR)
              ELSE 'h' || CAST(event_id % {_TRAP_HOSTS} AS VARCHAR)
                   || '/p' || CAST(event_id % {_TRAP_PATHS} AS VARCHAR) END AS url,
         CASE WHEN (event_id % {_TRAP_HOSTS}) % {_TRAP_MOD} = 0
              THEN (event_id % {_TRAP_PATHS}) % {_TRAP_CONTENT}
              ELSE event_id % {_TRAP_PATHS} END AS ck
  FROM events),
f AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches FROM p GROUP BY host),
u AS (SELECT host,
             CAST(COUNT(*) AS BIGINT) AS n_urls,
             CAST(SUM(CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_param_urls
      FROM (SELECT DISTINCT host, url FROM p) GROUP BY host),
c AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_content
      FROM (SELECT DISTINCT host, ck FROM p) GROUP BY host)
SELECT f.host, f.n_fetches, u.n_urls, u.n_param_urls, c.n_content,
       (1000 * u.n_urls) // c.n_content AS urls_per_content_permille,
       u.n_urls >= {_TRAP_RATIO} * c.n_content AS is_trap
FROM f JOIN u ON f.host = u.host JOIN c ON f.host = c.host
"""


@query("q189_crawl_trap_detection", oracle=_TRAP_ORACLE)
def q189_crawl_trap_detection(spark, sf_dir):
    """Crawler-trap detection — flag hosts whose URL space is inflated
    far beyond their CONTENT space (session-id query params, calendar
    pages, faceted-navigation explosions: Heydon & Najork "Mercator"
    §3.3's spider traps). Per host: fetch count, distinct-URL count,
    distinct-URL-with-query-params count, distinct-content count (by
    content fingerprint), the URL-per-content ratio in permille, and
    the trap flag at >= {ratio}x — the signal a frontier uses to demote
    a host's remaining URL families. Complementary to its two SHAPE-side
    siblings — q81 flags hosts whose URLs collapse to few digit-run
    templates, q97 learns WHICH query params are content-irrelevant
    (DUST rules) — this is the CONTENT-side confirmation: it never looks
    at URL shape beyond the '?' census, only at whether distinct URLs
    keep yielding distinct content fingerprints (q112's templates say
    WHICH shapes; this says the host mints shapes faster than content). The
    fixture plants traps on hid % {mod} == 0: those hosts wrap every
    path into a '?sid=' variant while content collapses mod {content}.

    Scale shape: three skinny host-keyed aggregates, never a corpus
    cross-join — the URL and content legs are map-side partial dedups
    of (host, url) / (host, fingerprint) followed by one host-keyed
    exchange each (the q57/q142 census discipline; no multi-distinct
    Expand that would triple corpus rows before the shuffle), then a
    3-way join on host — 10^7-ish host rows at web scale, trivially
    parallel, AQE-coalesced. All counts BIGINT; ratio is integer
    permille. Reference semantic: none — the reference crawls a fixed
    curated source list (parallel_scraper_manager.py source registry)
    and never meets an adversarial URL space; an open-web frontier
    dies without this gate.
    """
    hid = F.col("event_id") % _TRAP_HOSTS
    trap = hid % _TRAP_MOD == 0
    pk = F.col("event_id") % _TRAP_PATHS
    host = F.concat(F.lit("h"), hid.cast("string"))
    url = F.when(
        trap,
        F.concat(
            host,
            F.lit("/p"),
            (pk % _TRAP_CONTENT).cast("string"),
            F.lit("?sid="),
            F.expr(f"event_id div {_TRAP_HOSTS}").cast("string"),
        ),
    ).otherwise(F.concat(host, F.lit("/p"), pk.cast("string")))
    ck = F.when(trap, pk % _TRAP_CONTENT).otherwise(pk).cast("long")
    p = (
        t(spark, sf_dir, "events")
        .select(host.alias("host"), url.alias("url"), ck.alias("ck"))
        .localCheckpoint(eager=False)  # read by all three census legs
    )
    fetches = p.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n_fetches"))
    urls = (
        p.select("host", "url")
        .distinct()
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("url").contains("?"), 1).otherwise(0))
            .cast("long")
            .alias("n_param_urls"),
        )
    )
    content = (
        p.select("host", "ck")
        .distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_content"))
    )
    return (
        fetches.join(urls, "host")
        .join(content, "host")
        .select(
            "host",
            "n_fetches",
            "n_urls",
            "n_param_urls",
            "n_content",
            F.expr("(1000 * n_urls) div n_content").alias(
                "urls_per_content_permille"
            ),
            (F.col("n_urls") >= _TRAP_RATIO * F.col("n_content")).alias("is_trap"),
        )
    )


q189_crawl_trap_detection.__doc__ = q189_crawl_trap_detection.__doc__.replace(
    "{ratio}", str(_TRAP_RATIO)
).replace("{mod}", str(_TRAP_MOD)).replace("{content}", str(_TRAP_CONTENT))
