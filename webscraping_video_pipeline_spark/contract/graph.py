"""Link-graph and crawl-scheduling analytics (round 4, session 2): the
three frontier-feeding operators a production crawler runs BETWEEN
rounds and that no prior contract query covered —

- **q80 PageRank over the link graph** (power iteration): the classic
  authority prior a priority frontier (operators/frontier.py) consumes;
  the reference hard-codes per-source priorities (config.py:15-72), a
  web-scale crawl derives them from the graph.
- **q81 crawl-trap detection**: per-host URL-template explosion — many
  URLs collapsing to few digit-normalized templates marks calendar /
  session-id traps that would otherwise eat the fetch budget
  (the reference's per-source allow-lists sidestep traps by
  construction; an open crawl must detect them).
- **q82 freshness-driven re-visit scheduling**: estimate each URL's
  content-change rate from its fetch history and rank stale,
  fast-changing URLs for re-crawl (the incremental-crawl counterpart of
  the reference's one-shot scrape loop,
  parallel_scraper_manager.py:140-178).

All three are DuckDB-oracle-checked on the driver's testdata: the link
graph is derived DETERMINISTICALLY from ``documents`` (out-links =
md5(doc_id:j) mod N — a pure function of the table, same in both
engines), the URL corpus from the q37 synthetic-frontier recipe, and
the fetch history from ``events``.

Cross-engine determinism: per-edge rank contributions are one IEEE
double division then CAST to decimal(27,12) (HALF_UP in both engines)
and summed EXACTLY, so every PageRank iteration is bit-identical
regardless of partitioning or engine — the same idiom as the k-means
trainer (operators/kmeans.py). Counts are BIGINT; no raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

_PR_DAMP = 0.85
_PR_ITERS = 3
_PR_FANOUT = 3

# One unrolled power-iteration step (oracle side). {i} = this round,
# {p} = previous. Per-edge contribution r/odeg is a single double
# division rounded to decimal(27,12) and summed exactly; dangling mass
# is redistributed uniformly.
_PR_ITER_SQL = """
c{i} AS (
  SELECT e.dst AS node, SUM(CAST(r{p}.r / o.odeg AS DECIMAL(27,12))) AS s
  FROM edges e JOIN r{p} ON r{p}.node = e.src JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst),
d{i} AS (
  SELECT COALESCE(SUM(CAST(r{p}.r AS DECIMAL(27,12))), CAST(0 AS DECIMAL(27,12))) AS dg
  FROM r{p} WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r{p}.node)),
r{i} AS (
  SELECT nodes.node,
         CAST(0.15 AS DOUBLE)/n.nd
         + CAST(0.85 AS DOUBLE) * (COALESCE(CAST(c{i}.s AS DOUBLE), CAST(0 AS DOUBLE))
                                   + CAST(d{i}.dg AS DOUBLE)/n.nd) AS r
  FROM nodes CROSS JOIN n CROSS JOIN d{i} LEFT JOIN c{i} ON c{i}.node = nodes.node)
"""

_PR_ORACLE = (
    """
    WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, COUNT(*) AS nn FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE)/n.nd AS r FROM nodes CROSS JOIN n),
    """
    + ",".join(_PR_ITER_SQL.format(i=i, p=i - 1) for i in range(1, _PR_ITERS + 1))
    + f"""
    SELECT nodes.node AS doc_id,
           CAST(COALESCE(o.odeg, 0) AS BIGINT) AS out_deg,
           r{_PR_ITERS}.r AS pr
    FROM nodes LEFT JOIN outdeg o ON o.src = nodes.node
               JOIN r{_PR_ITERS} ON r{_PR_ITERS}.node = nodes.node
    """
)


def _link_graph(spark, sf_dir):
    """(edges, nodes, n1): deterministic synthetic link graph — each page
    links to _PR_FANOUT targets md5(doc_id:j) mod N (self-loops dropped,
    parallel edges deduped). nodes=(node,), edges=(src,dst), n1 is the
    1-row count frame (broadcast everywhere it is used)."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    n1 = d.agg(F.count(F.lit(1)).alias("nn"))
    h = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("j").cast("string")
        )
    )
    edges = (
        d.crossJoin(F.broadcast(n1))
        .select(
            "doc_id",
            "nn",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, _PR_FANOUT + 1)])
            ).alias("j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.col("nn")).alias(
                "dst"
            ),
        )
        .filter(F.col("dst") != F.col("src"))
        .distinct()
    )
    return edges, d.select(F.col("doc_id").alias("node")), n1


@query("q80_linkgraph_pagerank", oracle=_PR_ORACLE)
def q80_linkgraph_pagerank(spark, sf_dir, _capture=None):
    """PageRank power iteration (3 rounds, d=0.85) over the synthetic
    link graph — the authority prior the priority frontier ranks by.
    Per-edge contribution = rank/outdeg (one IEEE division) rounded to
    decimal(27,12) and summed EXACTLY per destination, so iterations are
    bit-identical across engines and partitionings; dangling mass (pages
    with no out-links) is redistributed uniformly each round via a 1-row
    broadcast aggregate.

    Scale shape: edges are hash-partitioned on src ONCE and
    checkpoint-staged (a production loop persists/writes them — the
    kmeans barrier, durable at 10^10 edges); outdeg, nodes, and each
    round's rank vector are staged with the SAME hash partitioning, so
    within an iteration the edges⋈ranks⋈outdeg joins and the
    nodes⋈contrib rank rebuild all co-locate WITHOUT exchanges — the
    only shuffle per round is the groupBy(dst) of skinny
    (dst, decimal) contributions, map-side combined (the per-iteration
    plan is audited via the ``_capture`` hook, the q50 pattern, since
    the checkpoints hide it from the final explain). Mega-hub
    destinations skew that groupBy; AQE skew-split handles it (the
    contribution rows are ~16 bytes — salting buys nothing at that
    width).

    Reference semantic: the frontier priority that
    config.py:15-72 hard-codes per source, derived from the graph
    instead (Page et al. 1999 PageRank; Abiteboul et al. 2003
    OPIC crawl ordering — public literature)."""
    edges, nodes, n1 = _link_graph(spark, sf_dir)
    nd = F.col("nn").cast("double")
    # Stage the loop-invariant frames once, all partitioned by the join
    # key (same hash function/partition count -> co-located joins below).
    n1 = n1.localCheckpoint(eager=False)
    edges = edges.repartition("src").localCheckpoint(eager=False)
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("odeg"))
        .localCheckpoint(eager=False)
    )
    nodes = nodes.repartition("node").localCheckpoint(eager=False)
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / nd).alias("r")
    )
    for _it in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                "dst",
                (F.col("r") / F.col("odeg")).cast("decimal(27,12)").alias("cc"),
            )
            .groupBy("dst")
            .agg(F.sum("cc").alias("s"))
        )
        dang = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left_anti"
        ).agg(
            F.coalesce(
                F.sum(F.col("r").cast("decimal(27,12)")),
                F.lit(0).cast("decimal(27,12)"),
            ).alias("dg")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dang))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(0.15) / nd
                    + F.lit(_PR_DAMP)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dg").cast("double") / nd
                    )
                ).alias("r"),
            )
        )
        if _capture is not None:
            _capture[f"q80.iter{_it}"] = ranks
        ranks = ranks.localCheckpoint(eager=False)
    return (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .join(ranks, "node")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("odeg"), F.lit(0)).cast("long").alias("out_deg"),
            F.col("r").alias("pr"),
        )
    )


def trap_url_frame(spark, sf_dir):
    """(host, url) synthetic URL corpus — the Spark twin of
    ``_TRAP_URLS_SQL``, shared by q81 (trap detection) and q124 (front
    coding): one URL per document, host = source domain, path =
    calendar-style counter on src0/src1 and lang/first-word elsewhere."""
    d = t(spark, sf_dir, "documents")
    w1 = F.element_at(F.split(F.col("text"), " "), 1)
    path = F.when(
        F.col("source").isin("src0", "src1"),
        F.concat(F.lit("cal/"), ((F.col("doc_id") * 7919) % 100000).cast("string")),
    ).otherwise(F.concat(F.col("lang"), F.lit("/"), w1))
    return d.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/"),
            path,
            F.lit("/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


_TRAP_URLS_SQL = """
    SELECT source || '.example.com' AS host,
           'https://' || source || '.example.com/' ||
           (CASE WHEN source IN ('src0', 'src1')
                 THEN 'cal/' || CAST((doc_id * 7919) % 100000 AS VARCHAR)
                 ELSE lang || '/' || string_split(text, ' ')[1] END) ||
           '/p' || CAST(doc_id AS VARCHAR) AS url
    FROM documents
"""


@query(
    "q81_crawl_trap_detector",
    oracle=f"""
    WITH u AS ({_TRAP_URLS_SQL})
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT regexp_replace(url, '[0-9]+', 'N', 'g')) AS BIGINT)
             AS n_templates,
           CAST(COUNT(*) AS DOUBLE) /
             CAST(COUNT(DISTINCT regexp_replace(url, '[0-9]+', 'N', 'g')) AS DOUBLE)
             AS urls_per_template,
           (COUNT(*) >= 10 AND
            CAST(COUNT(*) AS DOUBLE) /
              CAST(COUNT(DISTINCT regexp_replace(url, '[0-9]+', 'N', 'g')) AS DOUBLE)
              > 5.0) AS is_trap
    FROM u GROUP BY host
    """,
)
def q81_crawl_trap_detector(spark, sf_dir):
    """Crawl-trap detection: normalize every discovered URL to a template
    (digit runs -> 'N') and flag hosts where many URLs collapse to few
    templates — the calendar / session-id / infinite-pagination signature.
    A trapped host's surviving budget goes to ONE URL per template; here
    the detector just reports (host, n_urls, n_templates, ratio, is_trap)
    so the frontier can cap it. The fixture plants traps on src0/src1
    (counter-style paths) against word-keyed paths elsewhere.

    Scale shape: one shuffle — groupBy(host) with a distinct-template
    count (partial_count_distinct map-side). Templates never leave their
    host's partition; at 10^10 URLs the host key is exactly the frontier's
    politeness partitioning, so this rollup rides the exchange the
    scheduler already pays for. Mega-host skew: the same host-hash
    salting as operators/frontier.py (count-distinct re-merges exactly).

    Reference semantic: the reference never meets traps (per-source
    allow-lists, pexels_scraper.py:40-60); an open web crawl must detect
    them — heritrix-style path-template heuristics (public crawler practice)."""
    u = trap_url_frame(spark, sf_dir)
    tmpl = F.regexp_replace(F.col("url"), "[0-9]+", "N")
    agg = u.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(tmpl).alias("n_templates"),
    )
    ratio = F.col("n_urls").cast("double") / F.col("n_templates").cast("double")
    return agg.select(
        "host",
        "n_urls",
        "n_templates",
        ratio.alias("urls_per_template"),
        ((F.col("n_urls") >= 10) & (ratio > 5.0)).alias("is_trap"),
    )


@query(
    "q82_revisit_scheduler",
    oracle="""
    WITH f AS (
      SELECT user_id % 200 AS url_id, ts, event_id, value,
             lag(value) OVER (PARTITION BY user_id % 200
                              ORDER BY ts ASC, event_id ASC) AS prev
      FROM events),
    per AS (
      SELECT url_id,
             CAST(COUNT(*) AS BIGINT) AS n_fetches,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND value <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
             MAX(ts) AS last_ts
      FROM f GROUP BY url_id),
    h AS (SELECT MAX(ts) AS horizon FROM events)
    SELECT url_id, n_fetches, n_changes,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_fetch,
           CAST(date_diff('second', last_ts, horizon) AS BIGINT) AS staleness_s,
           CASE WHEN n_fetches > 1
                THEN CAST(n_changes AS DOUBLE) / CAST(n_fetches - 1 AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS change_rate,
           (CASE WHEN n_fetches > 1
                 THEN CAST(n_changes AS DOUBLE) / CAST(n_fetches - 1 AS DOUBLE)
                 ELSE CAST(0 AS DOUBLE) END)
             * (CAST(date_diff('second', last_ts, horizon) AS DOUBLE) / 3600.0)
             AS revisit_priority,
           ((CASE WHEN n_fetches > 1
                  THEN CAST(n_changes AS DOUBLE) / CAST(n_fetches - 1 AS DOUBLE)
                  ELSE CAST(0 AS DOUBLE) END)
             * (CAST(date_diff('second', last_ts, horizon) AS DOUBLE) / 3600.0)
             > 8.0) AS due
    FROM per CROSS JOIN h
    """,
)
def q82_revisit_scheduler(spark, sf_dir):
    """Freshness-driven re-visit scheduling: from each URL's fetch history
    (``events`` as fetch observations: url_id = user_id%200, value as the
    observed content sketch), estimate the change rate (fraction of
    consecutive fetch pairs whose content differed) and rank URLs by
    change_rate x staleness — stale, fast-changing pages re-enter the
    frontier first (due = priority > 8 fetch-equivalents).

    Scale shape: ONE shuffle on url_id serving both the lag() window and
    the per-URL rollup (same partitioning — Catalyst reuses the
    exchange), plus a 1-row broadcast horizon. At 10^10 URLs the fetch
    log is already partitioned by url hash (the frontier's layout), so
    the window sorts within partitions without a fresh exchange. The
    change estimator is intentionally a ratio, not an exponential-decay
    fit: no transcendental functions, so the output is bit-deterministic
    cross-engine (ln/exp are NOT identically rounded across libms).

    Reference semantic: the reference re-scrapes everything each run
    (parallel_scraper_manager.py:140-178); an incremental crawl
    re-schedules by estimated change frequency (Cho & Garcia-Molina 2003,
    freshness-driven crawl ordering — public literature)."""
    e = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 200).alias("url_id"), "ts", "event_id", "value"
    )
    w = Window.partitionBy("url_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    per = (
        e.withColumn("prev", F.lag("value").over(w))
        .groupBy("url_id")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(
                (F.col("prev").isNotNull() & (F.col("value") != F.col("prev"))).cast(
                    "long"
                )
            ).alias("n_changes"),
            F.max("ts").alias("last_ts"),
        )
    )
    hor = e.agg(F.max("ts").alias("horizon"))
    stale = F.unix_timestamp("horizon") - F.unix_timestamp("last_ts")
    rate = F.when(
        F.col("n_fetches") > 1,
        F.col("n_changes").cast("double") / (F.col("n_fetches") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    pri = rate * (stale.cast("double") / F.lit(3600.0))
    return per.crossJoin(F.broadcast(hor)).select(
        "url_id",
        "n_fetches",
        "n_changes",
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_fetch"),
        stale.cast("long").alias("staleness_s"),
        rate.alias("change_rate"),
        pri.alias("revisit_priority"),
        (pri > 8.0).alias("due"),
    )


@query(
    "q85_authority_frontier",
    oracle=f"""
    WITH pr_out AS (SELECT * FROM ({_PR_ORACLE})),
    u AS (
      SELECT doc_id, lower(source) || '.example.com' AS host FROM documents),
    ranked AS (
      SELECT u.host, u.doc_id, p.pr,
             ROW_NUMBER() OVER (PARTITION BY u.host
                                ORDER BY p.pr DESC, u.doc_id ASC) - 1 AS slot
      FROM u JOIN pr_out p ON p.doc_id = u.doc_id)
    SELECT host, doc_id, pr, slot,
           CAST(slot AS DOUBLE) * 2.0 AS offset_s
    FROM ranked WHERE slot < 4
    """,
)
def q85_authority_frontier(spark, sf_dir):
    """Composition: the PageRank authority prior (q80) actually FEEDING
    the politeness scheduler (q36's slot discipline) — per host, the 4
    highest-authority pages win the round's fetch slots (pr desc, doc_id
    tiebreak), each offset by the 2.0s crawl delay. This is the
    frontier-prioritization loop the engine runs between rounds: graph
    job emits ranks, scheduler consumes them in place of the reference's
    hard-coded per-source priorities (config.py:15-72).

    Scale shape: q80's output is O(pages) skinny rows; the join to the
    frontier is on doc_id (at 10^10 pages both sides partition on the
    url/doc key the frontier already uses), and the per-host slot window
    is the same politeness exchange every round pays (operators/
    politeness.py). Nothing new moves: rank rows ride the existing
    schedule shuffle.
    """
    pr = q80_linkgraph_pagerank(spark, sf_dir).select("doc_id", "pr")
    u = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lower(F.col("source")), F.lit(".example.com")).alias("host"),
    )
    w = Window.partitionBy("host").orderBy(F.col("pr").desc(), F.col("doc_id").asc())
    return (
        u.join(pr, "doc_id")
        .withColumn("slot", F.row_number().over(w) - 1)
        .filter(F.col("slot") < 4)
        .select(
            "host",
            "doc_id",
            "pr",
            "slot",
            (F.col("slot").cast("double") * 2.0).alias("offset_s"),
        )
    )

# ------------------------------------------------------------------ q96
# ANF / HyperBall neighborhood function: per page, estimate how many
# pages are reachable within _ANF_ROUNDS clicks using k Flajolet-Martin
# bitmask registers unioned along edges with bit_or. Registers are
# md5-derived integers and every step is integer bit arithmetic, so the
# result is bit-identical across engines and partitionings (the house
# no-transcendentals rule: the only double op is one final division).
_ANF_K = 8
_ANF_ROUNDS = 3
_ANF_OVERFLOW = 16  # h==0 (prob 2^-16) lands in the overflow register bit
_ANF_CMASK = (1 << 18) - 1  # complement window: bits 0..17, so ~mask & CMASK != 0


def _anf_lzb(col: str) -> str:
    """SQL for the lowest-zero-bit index of a register (valid in BOTH
    Spark SQL and DuckDB: ~, &, unary -, bit_count)."""
    c = f"((~{col}) & {_ANF_CMASK})"
    return f"bit_count(({c} & -{c}) - 1)"


_ANF_LZB_SUM = " + ".join(_anf_lzb(f"m{j}") for j in range(_ANF_K))


def _anf_register(m: int):
    """Spark Column: initial FM register for sketch m of `node` — a single
    bit at the lowest-set-bit index of a 16-bit md5 slice (so bit p is
    set with probability 2^-(p+1)); h==0 lands in the overflow bit."""
    h = (
        f"CAST(conv(substr(md5(concat(CAST(node AS STRING), ':{m}')), 1, 4),"
        f" 16, 10) AS BIGINT)"
    )
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CASE WHEN {h} = 0 THEN {_ANF_OVERFLOW}"
        f" ELSE bit_count(({h} & -{h}) - 1) END)"
    ).alias(f"m{m}")


def _anf_rounds(spark, sf_dir, _capture=None, tag="q96"):
    """Run the register iteration once; return [r0, r1, ..., rN] (each
    checkpoint-staged, partitioned on node). q96 consumes the last
    round; q99's harmonic centrality consumes the whole trajectory —
    per the HyperBall recipe the rounds come for free on the way."""
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    regs = nodes.select("node", *[_anf_register(m) for m in range(_ANF_K)])
    edges = edges.repartition("dst").localCheckpoint(eager=False)
    regs = regs.repartition("node").localCheckpoint(eager=False)
    rounds = [regs]
    for _it in range(_ANF_ROUNDS):
        contrib = (
            edges.join(regs, edges["dst"] == regs["node"])
            .groupBy("src")
            .agg(*[F.expr(f"bit_or(m{j})").alias(f"b{j}") for j in range(_ANF_K)])
        )
        nxt = regs.join(contrib, regs["node"] == contrib["src"], "left").select(
            "node",
            *[
                (
                    F.col(f"m{j}").bitwiseOR(
                        F.coalesce(F.col(f"b{j}"), F.lit(0).cast("long"))
                    )
                ).alias(f"m{j}")
                for j in range(_ANF_K)
            ],
        )
        if _capture is not None:
            _capture[f"{tag}.iter{_it}"] = nxt
        regs = nxt.repartition("node").localCheckpoint(eager=False)
        rounds.append(regs)
    return rounds


_ANF_CTES = (
    """
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, COUNT(*) AS nn FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    r0 AS (SELECT node, """
    + ", ".join(
        "(CAST(1 AS BIGINT) << (CASE WHEN h{m} = 0 THEN {ov} ELSE bit_count((h{m} & -h{m}) - 1) END)) AS m{m}".format(
            m=m, ov=_ANF_OVERFLOW
        )
        for m in range(_ANF_K)
    )
    + " FROM (SELECT node, "
    + ", ".join(
        f"CAST('0x' || substr(md5(CAST(node AS VARCHAR) || ':{m}'), 1, 4) AS BIGINT) AS h{m}"
        for m in range(_ANF_K)
    )
    + " FROM nodes) hh),\n"
    + ",\n".join(
        (
            "c{i} AS (SELECT e.src AS node, "
            + ", ".join(f"bit_or(r{{p}}.m{j}) AS b{j}" for j in range(_ANF_K))
            + " FROM edges e JOIN r{p} ON r{p}.node = e.dst GROUP BY e.src),\n"
            "r{i} AS (SELECT r{p}.node, "
            + ", ".join(
                f"r{{p}}.m{j} | COALESCE(c{{i}}.b{j}, 0) AS m{j}" for j in range(_ANF_K)
            )
            + " FROM r{p} LEFT JOIN c{i} ON c{i}.node = r{p}.node)"
        ).format(i=i, p=i - 1)
        for i in range(1, _ANF_ROUNDS + 1)
    )
)

_ANF_ORACLE = (
    "WITH "
    + _ANF_CTES
    + f"""
    SELECT doc_id, lzb_sum,
           CAST((CAST(1 AS BIGINT) << CAST(lzb_sum // {_ANF_K} AS INT)) AS DOUBLE) / 0.77351
             AS est_reach3
    FROM (SELECT node AS doc_id, CAST({_ANF_LZB_SUM} AS BIGINT) AS lzb_sum
          FROM r{_ANF_ROUNDS}) s
    """
)


@query("q96_anf_reach_sketch", oracle=_ANF_ORACLE)
def q96_anf_reach_sketch(spark, sf_dir, _capture=None):
    """ANF / HyperBall neighborhood function over the link graph: per
    page, a k={k} Flajolet-Martin bitmask sketch of the set of pages
    reachable within {r} clicks, unioned along out-edges one hop per
    round with a bit_or aggregate. The crawl use: est_reach3 is the
    discovery-potential prior (how much NEW frontier a page unlocks),
    the metric OPIC/BFS-depth scheduling wants but exact reachability
    can't provide at web scale (it is O(V*E)); the sketch gives it in
    {r} linear passes, 8 longs per page.

    Cross-engine determinism: registers are md5-derived bit positions
    (prob 2^-(p+1) -> lowest-set-bit of a 16-bit hash, overflow bit at
    {ov}); every union is integer bit_or; the estimate 2^floor(R/k) is
    an integer shift; the ONLY floating op is the final /0.77351
    (Flajolet-Martin correction), one IEEE division in both engines.

    Scale shape (the HyperBall recipe, Boldi & Vigna 2013, public
    literature): edges hash-partitioned on dst ONCE and checkpoint-
    staged; each round is one groupBy(src) bit_or of fixed-width longs
    (map-side combined, whole-stage codegen - no arrays, no UDFs) plus
    a co-partitioned left join back to the register table. Register
    state is k*8 bytes/page = 640 GB at 10^10 pages, spread over the
    cluster; nothing driver-sized anywhere. Mega-hub skew in the
    groupBy(src): AQE skew-split on 72-byte rows.

    Reference semantic: the reference's crawl depth is a per-source
    constant (config.py); an open crawl derives reach from the graph.
    """.format(k=_ANF_K, r=_ANF_ROUNDS, ov=_ANF_OVERFLOW)
    rounds = _anf_rounds(spark, sf_dir, _capture=_capture, tag="q96")
    out = rounds[-1].select(
        F.col("node").alias("doc_id"),
        F.expr(f"CAST({_ANF_LZB_SUM} AS BIGINT)").alias("lzb_sum"),
    )
    return out.select(
        "doc_id",
        "lzb_sum",
        F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT),"
            f" CAST(lzb_sum div {_ANF_K} AS INT)) AS DOUBLE) / 0.77351"
        ).alias("est_reach3"),
    )

# ------------------------------------------------------------------ q98
_TR_SEED_MOD = 17  # doc_id % 17 == 0 -> trusted seed (~6% of pages)
_TR_ITERS = 3

# One unrolled TrustRank step: same exact-decimal per-edge contribution
# fold as PageRank, but teleport AND dangling mass go to the trusted
# seed distribution tv (0 for non-seeds) instead of uniformly.
_TR_ITER_SQL = """
c{i} AS (
  SELECT e.dst AS node, SUM(CAST(r{p}.r / o.odeg AS DECIMAL(27,12))) AS s
  FROM edges e JOIN r{p} ON r{p}.node = e.src JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst),
d{i} AS (
  SELECT COALESCE(SUM(CAST(r{p}.r AS DECIMAL(27,12))), CAST(0 AS DECIMAL(27,12))) AS dg
  FROM r{p} WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = r{p}.node)),
r{i} AS (
  SELECT nodes.node,
         CAST(0.15 AS DOUBLE) * nodes.tv
         + CAST(0.85 AS DOUBLE) * (COALESCE(CAST(c{i}.s AS DOUBLE), CAST(0 AS DOUBLE))
                                   + CAST(d{i}.dg AS DOUBLE) * nodes.tv) AS r
  FROM nodes CROSS JOIN d{i} LEFT JOIN c{i} ON c{i}.node = nodes.node)
"""

_TR_ORACLE = (
    f"""
    WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, COUNT(*) AS nn FROM documents),
    ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nsd FROM documents
           WHERE doc_id % {_TR_SEED_MOD} = 0),
    nodes AS (SELECT doc_id AS node,
                     CASE WHEN doc_id % {_TR_SEED_MOD} = 0
                          THEN CAST(1 AS DOUBLE) / ns.nsd
                          ELSE CAST(0 AS DOUBLE) END AS tv
              FROM documents CROSS JOIN ns),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM edges GROUP BY src),
    r0 AS (SELECT node, tv AS r FROM nodes),
    """
    + ",".join(_TR_ITER_SQL.format(i=i, p=i - 1) for i in range(1, _TR_ITERS + 1))
    + f"""
    SELECT nodes.node AS doc_id,
           nodes.tv > 0 AS is_seed,
           r{_TR_ITERS}.r AS tr
    FROM nodes JOIN r{_TR_ITERS} ON r{_TR_ITERS}.node = nodes.node
    """
)


@query("q98_trustrank", oracle=_TR_ORACLE)
def q98_trustrank(spark, sf_dir):
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen 2004 — public
    literature): PageRank with the teleport vector restricted to a
    trusted seed set (doc_id % {mod} == 0 here; a curated whitelist in
    production), so trust flows OUT of the seeds along links and decays
    with distance — pages unreachable from any seed get tr ~ 0. The
    crawl use: rank = q80's authority, tr = this; high-rank/low-trust
    pages are the link-spam demotion list, and the frontier spends its
    budget on trusted neighborhoods first.

    Same exact-arithmetic discipline as q80 (per-edge contribution =
    one IEEE division cast to decimal(27,12), summed exactly;
    bit-identical across engines/partitionings); dangling mass and
    teleport both redistribute to the SEED distribution (the
    personalization semantics), not uniformly.

    Scale shape: identical to q80 — loop-invariant frames staged once,
    hash-partitioned on the join key; per round one skinny
    (dst, decimal) groupBy plus a 1-row dangling broadcast. The seed
    vector is a column on the node table, not a driver-side structure,
    so |seeds| can be millions without any plan change.
    """.format(mod=_TR_SEED_MOD)
    edges, nodes, n1 = _link_graph(spark, sf_dir)
    ns1 = (
        nodes.filter(F.col("node") % _TR_SEED_MOD == 0)
        .agg(F.count(F.lit(1)).cast("double").alias("nsd"))
    )
    nodes = (
        nodes.crossJoin(F.broadcast(ns1))
        .select(
            "node",
            F.when(
                F.col("node") % _TR_SEED_MOD == 0,
                F.lit(1.0) / F.col("nsd"),
            )
            .otherwise(F.lit(0.0))
            .alias("tv"),
        )
        .repartition("node")
        .localCheckpoint(eager=False)
    )
    edges = edges.repartition("src").localCheckpoint(eager=False)
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("odeg"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.col("tv").alias("r"))
    for _it in range(_TR_ITERS):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                "dst",
                (F.col("r") / F.col("odeg")).cast("decimal(27,12)").alias("cc"),
            )
            .groupBy("dst")
            .agg(F.sum("cc").alias("s"))
        )
        dang = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left_anti"
        ).agg(
            F.coalesce(
                F.sum(F.col("r").cast("decimal(27,12)")),
                F.lit(0).cast("decimal(27,12)"),
            ).alias("dg")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(dang))
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.lit(0.15) * F.col("tv")
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dg").cast("double") * F.col("tv")
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return nodes.join(ranks, "node").select(
        F.col("node").alias("doc_id"),
        (F.col("tv") > 0).alias("is_seed"),
        F.col("r").alias("tr"),
    )

# ------------------------------------------------------------------ q99


def _hc_est(r_expr: str, idiv: str) -> str:
    """FM estimate 2^floor(R/k)/0.77351 as one deterministic expression;
    `idiv` is the engine's integer-division spelling ('//' or 'div')."""
    return (
        f"CAST((CAST(1 AS BIGINT) << CAST({r_expr} {idiv} {_ANF_K} AS INT))"
        f" AS DOUBLE) / 0.77351"
    )


def _hc_harm(idiv: str) -> str:
    e = [_hc_est(f"z{d}", idiv) for d in range(_ANF_ROUNDS + 1)]
    return " + ".join(
        f"(({e[d]}) - ({e[d - 1]})) / {d}.0" for d in range(1, _ANF_ROUNDS + 1)
    )


def _hc_sum(alias: str) -> str:
    return " + ".join(_anf_lzb(f"{alias}.m{j}") for j in range(_ANF_K))


_HC_ORACLE = (
    "WITH "
    + _ANF_CTES
    + ",\n    sums AS (SELECT r0.node, "
    + ", ".join(
        f"CAST({_hc_sum(f'r{d}')} AS BIGINT) AS z{d}"
        for d in range(_ANF_ROUNDS + 1)
    )
    + "\n    FROM r0 "
    + " ".join(
        f"JOIN r{d} ON r{d}.node = r0.node" for d in range(1, _ANF_ROUNDS + 1)
    )
    + ")\n    SELECT node AS doc_id, "
    + ", ".join(f"z{d} AS lzb{d}" for d in range(_ANF_ROUNDS + 1))
    + f",\n           {_hc_harm('//')} AS harmonic\n    FROM sums"
)


@query("q99_harmonic_centrality", oracle=_HC_ORACLE)
def q99_harmonic_centrality(spark, sf_dir):
    """Harmonic centrality via the ANF register trajectory — HyperBall's
    actual headline application (Boldi & Vigna 2013: "In-core
    computation of geometric centralities with HyperBall" — public
    literature): harm(v) = sum over distances d of |N(v,d) - N(v,d-1)|
    / d, where each neighborhood size comes from the SAME k=8 FM
    registers q96 maintains — the per-distance estimates fall out of
    the iteration for free, one row of integer sums per round. High
    harmonic centrality marks pages that reach much of the graph
    quickly: seed-quality candidates for a recrawl, and the tiebreak
    between equal-PageRank hubs.

    Cross-engine determinism: the round sums z0..z3 are pure integers;
    each per-distance estimate is an integer shift / one IEEE division
    (0.77351), and the harmonic fold is an identically-parenthesized
    chain of IEEE subtract/divide/add — bit-identical in both engines.

    Scale shape: identical to q96 (the registers ARE q96's — one
    bit_or exchange per round); the trajectory join at the end is
    node-co-partitioned from the checkpoint staging, so the only cost
    over q96 is keeping N x 4 x 8 longs instead of N x 8 — at 10^10
    pages the per-round sums can also be folded eagerly into 4 BIGINT
    columns to keep the state fixed-width (noted, not needed here)."""
    rounds = _anf_rounds(spark, sf_dir, tag="q99")
    sums = None
    for d, regs in enumerate(rounds):
        sd = regs.select(
            "node", F.expr(f"CAST({_ANF_LZB_SUM} AS BIGINT)").alias(f"z{d}")
        )
        sums = sd if sums is None else sums.join(sd, "node")
    return sums.select(
        F.col("node").alias("doc_id"),
        *[F.col(f"z{d}").alias(f"lzb{d}") for d in range(_ANF_ROUNDS + 1)],
        F.expr(_hc_harm("div")).alias("harmonic"),
    )


# ------------------------------------------------------------------ q117
_HITS_SCALE = 1_000_000  # scores live in micro units, max-normalized

_HITS_HALF_SQL = """
{out} AS (SELECT e.{gk} AS node, CAST(SUM(p.v) AS BIGINT) AS v
          FROM edges e JOIN {prev} p ON p.node = e.{jk} GROUP BY e.{gk}),
m{out} AS (SELECT MAX(v) AS m FROM {out}),
{out}n AS (SELECT node, (1000000 * v) // m AS v FROM {out} CROSS JOIN m{out})
"""

_HITS_ORACLE = (
    """
    WITH n AS (SELECT COUNT(*) AS nn FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS v FROM nodes),
    """
    + _HITS_HALF_SQL.format(out="a1", gk="dst", jk="src", prev="h0")
    + ","
    + _HITS_HALF_SQL.format(out="h1", gk="src", jk="dst", prev="a1n")
    + ","
    + _HITS_HALF_SQL.format(out="a2", gk="dst", jk="src", prev="h1n")
    + ","
    + _HITS_HALF_SQL.format(out="h2", gk="src", jk="dst", prev="a2n")
    + """
    SELECT nodes.node,
           COALESCE(h2n.v, 0) AS hub_micro,
           COALESCE(a2n.v, 0) AS auth_micro
    FROM nodes
    LEFT JOIN h2n ON h2n.node = nodes.node
    LEFT JOIN a2n ON a2n.node = nodes.node
    """
)


@query("q117_hits_hub_authority", oracle=_HITS_ORACLE)
def q117_hits_hub_authority(spark, sf_dir, _capture=None):
    """HITS hubs & authorities (Kleinberg 1999 — public literature), two
    full mutual-reinforcement iterations over the synthetic link graph:
    authority(v) = sum of hub scores linking TO v, hub(u) = sum of
    authority scores u links to, each half-step max-normalized back into
    micro units by INTEGER division — (10^6 * v) div max(v) — instead of
    the textbook L2 norm (a square root this repo's no-transcendentals
    rule forbids; max-normalization preserves the ranking, which is what
    the frontier consumes). All-BIGINT, so both engines and any
    partitioning produce identical scores. Completes the link-analysis
    trio next to PageRank (q80) and TrustRank (q98): PageRank prices a
    random surfer, HITS separates directories/link-farms (high hub, low
    authority) from content pages (the reverse) — the pair
    (hub_micro, auth_micro) is the spam-topology feature q81's trap
    detector and q85's authority frontier consume.

    Scale shape: identical to q80's loop — each half-step is ONE skinny
    (node, BIGINT) groupBy over edges pre-keyed on the join side, plus a
    1-row max broadcast; loop frames are localCheckpoint-staged. Width
    budget: scores <= 10^6, per-node sums <= 10^6 * degree, and the
    normalize multiply peaks at 10^12 * degree — BIGINT-safe through
    mega-hub degrees of 10^6; past that, swap the micro scale for
    decimal(38,0) (documented dial, same plan).
    """
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    edges = edges.repartition("src").localCheckpoint(eager=False)
    cur = nodes.select("node", F.lit(_HITS_SCALE).cast("long").alias("v"))

    def half(prev, group_key, join_key, tag):
        raw = (
            edges.join(
                prev.select(F.col("node").alias(join_key), "v"), join_key
            )
            .groupBy(F.col(group_key).alias("node"))
            .agg(F.sum("v").alias("v"))
        )
        m1 = raw.agg(F.max("v").alias("m"))
        out = raw.crossJoin(F.broadcast(m1)).select(
            "node", F.expr(f"({_HITS_SCALE} * v) div m").alias("v")
        )
        if _capture is not None:
            _capture[f"q117.{tag}"] = out
        return out.localCheckpoint(eager=False)

    a = half(cur, "dst", "src", "a1")
    h = half(a, "src", "dst", "h1")
    a = half(h, "dst", "src", "a2")
    h = half(a, "src", "dst", "h2")
    return (
        nodes.join(h.select("node", F.col("v").alias("hub_micro")), "node", "left")
        .join(a.select("node", F.col("v").alias("auth_micro")), "node", "left")
        .select(
            "node",
            F.coalesce("hub_micro", F.lit(0).cast("long")).alias("hub_micro"),
            F.coalesce("auth_micro", F.lit(0).cast("long")).alias("auth_micro"),
        )
    )


# ------------------------------------------------------------------ q121
_KCORE_K = 4
_KCORE_ROUNDS = 4

_KCORE_EDGES_SQL = """
    n AS (SELECT COUNT(*) AS nn FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    e0 AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)
"""

_KCORE_PEEL_SQL = """
d{r} AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
         FROM e{r} GROUP BY src),
e{r1} AS (SELECT u.src, u.dst FROM e{r} u
          JOIN d{r} s ON s.node = u.src AND s.d >= {k}
          JOIN d{r} t2 ON t2.node = u.dst AND t2.d >= {k})
"""

_KCORE_ORACLE = (
    "WITH "
    + _KCORE_EDGES_SQL
    + ", e1 AS (SELECT * FROM und),"
    + ",".join(
        _KCORE_PEEL_SQL.format(r=r, r1=r + 1, k=_KCORE_K)
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    + f""",
    dfin AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
             FROM e{_KCORE_ROUNDS + 1} GROUP BY src)
    SELECT nodes.node,
           COALESCE(dfin.d, 0) AS core_deg,
           COALESCE(dfin.d, 0) >= {_KCORE_K} AS in_core
    FROM nodes LEFT JOIN dfin ON dfin.node = nodes.node
    """
)


@query("q121_kcore_linkfarm", oracle=_KCORE_ORACLE)
def q121_kcore_linkfarm(spark, sf_dir, _capture=None):
    """K-core extraction by iterative peeling (Seidman 1983; Batagelj &
    Zaversnik 2003 — public literature) on the UNDIRECTED closure of the
    synthetic link graph: repeatedly drop nodes of degree < K and
    recompute degrees, K=4, a fixed 4 peel rounds. Densely interlinked
    page clusters (link farms, template networks) survive; organically
    linked pages peel away — the classic spam-core signal next to
    TrustRank (q98) and the trap detector (q81). Output per node:
    degree within the round-4 subgraph and the in-core flag. Fixed-R is
    the driver-checkable form; the production loop iterates this exact
    body to fixpoint (stop when the peeled-node count hits 0 — the test
    pins that this graph converges within 4 rounds, so fixed-R IS the
    fixpoint here).

    Scale shape: each round is ONE skinny (node, BIGINT) degree groupBy
    (map-side combined) plus two joins of the edge list against the
    alive-node set, all pre-keyed on src/dst; rounds are
    localCheckpoint-staged (the q80 loop pattern — per-round frames
    audited via ``_capture``). The alive set is node-sized, far smaller
    than edges — AQE broadcasts it when it fits. All-BIGINT,
    partitioning-independent.
    """
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    und = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    cur = und
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        alive = deg.filter(F.col("d") >= _KCORE_K).select("src")
        if _capture is not None:
            _capture[f"q121.d{r}"] = deg
        cur = (
            cur.join(alive, "src")
            .join(alive.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    dfin = cur.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return nodes.join(dfin, "node", "left").select(
        "node",
        F.coalesce("d", F.lit(0).cast("long")).alias("core_deg"),
        (F.coalesce("d", F.lit(0).cast("long")) >= _KCORE_K).alias("in_core"),
    )


# ------------------------------------------------------------------ q122
_OPIC_ITERS = 3
_OPIC_POOL = 10**12  # total cash = one trillion picocash units

# One unrolled synchronous OPIC round (oracle side). {i} = this round,
# {p} = previous. ALL arithmetic is BIGINT picocash: per-edge transfer
# = c div odeg (floor), dangling pool redistributed as dg div N — the
# q94 integer-micro-units idiom, so every round is bit-exact across
# engines and partitionings by construction (division remainders burn:
# < odeg picocash per node per round, ~1e-12 of the pool — noted in
# the docstring).
_OPIC_ITER_SQL = """
c{i} AS (
  SELECT e.dst AS node, CAST(SUM(s{p}.c // o.odeg) AS BIGINT) AS s
  FROM edges e JOIN s{p} ON s{p}.node = e.src JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst),
d{i} AS (
  SELECT COALESCE(CAST(SUM(s{p}.c) AS BIGINT), 0) AS dg
  FROM s{p} WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = s{p}.node)),
s{i} AS (
  SELECT nodes.node,
         COALESCE(c{i}.s, 0) + d{i}.dg // n.nn AS c,
         s{p}.h + s{p}.c AS h
  FROM nodes CROSS JOIN n CROSS JOIN d{i}
       JOIN s{p} ON s{p}.node = nodes.node
       LEFT JOIN c{i} ON c{i}.node = nodes.node)
"""

_OPIC_ORACLE = (
    f"""
    WITH n AS (SELECT COUNT(*) AS nn FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                    AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM edges GROUP BY src),
    s0 AS (SELECT node, CAST({_OPIC_POOL} AS BIGINT) // n.nn AS c, CAST(0 AS BIGINT) AS h
           FROM nodes CROSS JOIN n),
    """
    + ",".join(_OPIC_ITER_SQL.format(i=i, p=i - 1) for i in range(1, _OPIC_ITERS + 1))
    + f"""
    SELECT nodes.node AS doc_id,
           CAST(COALESCE(o.odeg, 0) AS BIGINT) AS out_deg,
           CAST(s{_OPIC_ITERS}.c AS BIGINT) AS cash_pico,
           CAST(s{_OPIC_ITERS}.h AS BIGINT) AS hist_pico,
           CAST(s{_OPIC_ITERS}.h + s{_OPIC_ITERS}.c AS BIGINT) AS importance_pico
    FROM nodes LEFT JOIN outdeg o ON o.src = nodes.node
               JOIN s{_OPIC_ITERS} ON s{_OPIC_ITERS}.node = nodes.node
    """
)


@query("q122_opic_importance", oracle=_OPIC_ORACLE)
def q122_opic_importance(spark, sf_dir, _capture=None):
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003 — public literature), the crawl-ordering estimator
    built for EXACTLY our setting: it ranks pages WHILE crawling,
    without storing the link matrix or waiting for PageRank to
    converge. Synchronous variant, 3 unrolled rounds: every node starts
    with cash pool/N; each round a node's cash is added to its HISTORY
    and distributed equally over its out-links (dangling cash
    redistributed uniformly); importance estimate = history + cash,
    which the paper proves converges to stationary importance. Unlike
    q80 there is no damping and the state is a (cash, history) PAIR —
    history is the time-integral the frontier actually sorts by, so
    early rounds already separate hubs from leaves (the
    crawl-while-you-rank property; q80 needs full sweeps before its
    ranks mean anything).

    Cross-engine determinism: ALL-BIGINT picocash (pool = 10^12 units),
    per-edge transfer = cash div odeg, dangling redistribution =
    dg div N — floor division everywhere, bit-exact on any engine and
    any partitioning BY CONSTRUCTION (the q94 integer-micro-units
    idiom). This replaced a decimal(27,12) draft that failed the
    oracle: undamped halving produces exact .5 ties at the rounding
    digit, where Spark's double->decimal cast (shortest-string,
    HALF_UP) and DuckDB's (exact binary value) disagree — integer
    division has no ties to disagree on. Remainders burn < odeg
    picocash per node per round (~1e-12 of the pool), the quantization
    an estimator tolerates by design.

    Scale shape: identical to the audited q80 loop — edges/outdeg/nodes
    staged ONCE on the src/node hash partitioning, each round's only
    exchange is the map-side-combined groupBy(dst) of ~16-byte
    (dst, BIGINT) cash rows; the state frame is checkpoint-staged per
    round exactly as a production crawler would persist it between
    crawl batches (that persistence is the POINT of OPIC: the estimate
    survives the crawl loop's restarts, plans/crawl.py's round
    discipline). Reference semantic: replaces the hard-coded per-source
    priorities (config.py:15-72) with importance learned online from
    the link structure."""
    edges, nodes, n1 = _link_graph(spark, sf_dir)
    n1 = n1.localCheckpoint(eager=False)
    edges = edges.repartition("src").localCheckpoint(eager=False)
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("odeg"))
        .localCheckpoint(eager=False)
    )
    nodes = nodes.repartition("node").localCheckpoint(eager=False)
    state = nodes.crossJoin(F.broadcast(n1)).select(
        "node",
        F.expr(f"cast({_OPIC_POOL} as bigint) div nn").alias("c"),
        F.lit(0).cast("long").alias("h"),
    )
    for _it in range(_OPIC_ITERS):
        contrib = (
            edges.join(state, edges["src"] == state["node"])
            .join(outdeg, "src")
            .select("dst", F.expr("c div odeg").alias("cc"))
            .groupBy("dst")
            .agg(F.sum("cc").cast("long").alias("s"))
        )
        dang = state.join(
            outdeg, state["node"] == outdeg["src"], "left_anti"
        ).agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("dg"))
        state = (
            nodes.crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dang))
            .join(state.select("node", "c", "h"), "node")
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.coalesce(F.col("s"), F.lit(0).cast("long"))
                    + F.expr("dg div nn")
                ).alias("c2"),
                (F.col("h") + F.col("c")).alias("h2"),
            )
            .select("node", F.col("c2").alias("c"), F.col("h2").alias("h"))
        )
        if _capture is not None:
            _capture[f"q122.iter{_it}"] = state
        state = state.localCheckpoint(eager=False)
    return (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
        .join(state, "node")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce(F.col("odeg"), F.lit(0)).cast("long").alias("out_deg"),
            F.col("c").alias("cash_pico"),
            F.col("h").alias("hist_pico"),
            (F.col("h") + F.col("c")).alias("importance_pico"),
        )
    )


# ------------------------------------------------------------------ q130
_RECIP_MIN_DEG = 2
_RECIP_PERMILLE = 500

_RECIP_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
marked AS (
  SELECT e.src, e.dst,
         CASE WHEN EXISTS (SELECT 1 FROM edges r
                           WHERE r.src = e.dst AND r.dst = e.src)
              THEN 1 ELSE 0 END AS recip
  FROM edges e),
per AS (SELECT src,
               CAST(COUNT(*) AS BIGINT) AS out_deg,
               CAST(SUM(recip) AS BIGINT) AS n_recip
        FROM marked GROUP BY src)
SELECT src AS doc_id, out_deg, n_recip,
       (1000 * n_recip) // out_deg AS recip_permille,
       (out_deg >= {_RECIP_MIN_DEG}
        AND (1000 * n_recip) // out_deg >= {_RECIP_PERMILLE}) AS nepotistic
FROM per
"""


@query("q130_reciprocal_link_spam", oracle=_RECIP_ORACLE)
def q130_reciprocal_link_spam(spark, sf_dir):
    """Reciprocal-link (nepotistic-link) detection — Davison 2000 /
    link-farm heuristics (public literature): an organic web link is
    rarely reciprocated, so a page most of whose out-links point BACK
    at it is trading links, and its edges should be discounted before
    PageRank/TrustRank ever run. Per source page: out-degree, count of
    reciprocated out-links (src->dst where dst->src also exists),
    reciprocity in integer permille, and the nepotistic flag (degree >=
    2 and >= 50% reciprocated). All-BIGINT — integer division, no
    floats.

    Scale shape: ONE extra exchange beyond the edge table itself — the
    reversed edge list is re-keyed by its (dst, src) pair for a
    left-semi self-join probe of ~16-byte keys, then the per-src rollup
    rides the src partitioning the edge table already has. No adjacency
    materialization, no N^2: reciprocity of E edges costs exactly one
    E-row hash join. Mega-hub srcs skew the rollup; AQE skew-split
    covers those skinny rows. Reference semantic: none — the
    reference's per-source allow-list (config.py:15-72) cannot meet
    link spam; an open crawl discounts it before authority flows
    (feeds q80/q98)."""
    edges, _nodes, _n1 = _link_graph(spark, sf_dir)
    edges = edges.localCheckpoint(eager=False)
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    marked = edges.join(rev, ["src", "dst"], "left_semi").select(
        "src", F.lit(1).alias("recip")
    )
    per = (
        edges.select("src", F.lit(0).alias("recip"))
        .unionByName(marked)
        .groupBy("src")
        .agg(
            # every edge contributed a 0-row; reciprocated ones add a 1-row
            (F.count(F.lit(1)) - F.sum("recip")).cast("long").alias("out_deg"),
            F.sum("recip").cast("long").alias("n_recip"),
        )
    )
    pm = F.expr("(1000 * n_recip) div out_deg")
    return per.select(
        F.col("src").alias("doc_id"),
        "out_deg",
        "n_recip",
        pm.alias("recip_permille"),
        (
            (F.col("out_deg") >= _RECIP_MIN_DEG)
            & (pm >= _RECIP_PERMILLE)
        ).alias("nepotistic"),
    )


# ------------------------------------------------------------------ q133
_ASSORT_ORACLE = """
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM edges GROUP BY src),
id_ AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS ideg FROM edges GROUP BY dst),
j AS (SELECT od.odeg AS x, id_.ideg AS y
      FROM edges e JOIN od ON od.src = e.src JOIN id_ ON id_.dst = e.dst),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sx2,
             CAST(SUM(y * y) AS BIGINT) AS sy2
      FROM j)
SELECT m AS n_edges, sx AS sum_odeg, sy AS sum_ideg,
       sxy AS sum_xy, sx2 AS sum_x2, sy2 AS sum_y2,
       m * sxy - sx * sy AS cov_num,
       m * sx2 - sx * sx AS var_x_num,
       m * sy2 - sy * sy AS var_y_num
FROM s
"""


@query("q133_degree_assortativity", oracle=_ASSORT_ORACLE)
def q133_degree_assortativity(spark, sf_dir):
    """Degree-assortativity moments of the link graph — Newman 2002
    ("Assortative mixing in networks" — public literature): over every
    edge, correlate the source's out-degree with the destination's
    in-degree. Organic webs are DISASSORTATIVE (hubs link to leaves,
    cov_num < 0); link farms wire high-degree nodes to each other and
    push the correlation positive — a one-row structural spam indicator
    next to q121's k-core and q130's reciprocity. Emits the EXACT
    integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) plus the Pearson
    numerator n·Σxy − ΣxΣy and both variance numerators, so the
    correlation's sign and magnitude are reproducible to the bit;
    the final r needs one square root the caller applies (BIGINT-safe
    through ~10^9 edges of degree ~10^3; past that the same sums go
    through decimal(38,0) unchanged).

    Scale shape: two skinny degree rollups (map-side combined) joined
    back onto the edge list on its existing src partitioning (one
    re-key for the dst side), then a single all-reduce of six integers —
    no state bigger than the edge list ever exists, the same
    degree-join discipline as q121. Mega-hubs skew the dst join; AQE
    skew-split covers ~16-byte rows. Reference semantic: none — the
    reference's fixed source list has no graph; an open crawl watches
    this number drift as spam campaigns wire in."""
    edges, _nodes, _n1 = _link_graph(spark, sf_dir)
    edges = edges.localCheckpoint(eager=False)
    od = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    idg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("ideg"))
    j = edges.join(od, "src").join(idg, "dst").select(
        F.col("odeg").alias("x"), F.col("ideg").alias("y")
    )
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    return s.select(
        F.col("m").alias("n_edges"),
        F.col("sx").alias("sum_odeg"),
        F.col("sy").alias("sum_ideg"),
        F.col("sxy").alias("sum_xy"),
        F.col("sx2").alias("sum_x2"),
        F.col("sy2").alias("sum_y2"),
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_num"),
        (F.col("m") * F.col("sx2") - F.col("sx") * F.col("sx")).alias("var_x_num"),
        (F.col("m") * F.col("sy2") - F.col("sy") * F.col("sy")).alias("var_y_num"),
    )


# ------------------------------------------------------------------ q145
_KHOP_ORACLE = """
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
f2 AS (SELECT DISTINCT e1.src AS node, e2.dst AS r
       FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
       WHERE e2.dst <> e1.src
       UNION SELECT DISTINCT src AS node, dst AS r FROM edges),
b2 AS (SELECT DISTINCT e1.dst AS node, e2.src AS r
       FROM edges e1 JOIN edges e2 ON e2.dst = e1.src
       WHERE e2.src <> e1.dst
       UNION SELECT DISTINCT dst AS node, src AS r FROM edges),
fc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS fwd2 FROM f2 GROUP BY node),
bc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS bwd2 FROM b2 GROUP BY node)
SELECT nodes.node AS doc_id,
       COALESCE(fc.fwd2, 0) AS fwd2,
       COALESCE(bc.bwd2, 0) AS bwd2,
       CASE WHEN COALESCE(fc.fwd2, 0) >= 3 AND COALESCE(bc.bwd2, 0) >= 3
              THEN 'core'
            WHEN COALESCE(fc.fwd2, 0) >= 3 THEN 'in_side'
            WHEN COALESCE(bc.bwd2, 0) >= 3 THEN 'out_side'
            ELSE 'periphery' END AS bowtie_class
FROM nodes LEFT JOIN fc ON fc.node = nodes.node
           LEFT JOIN bc ON bc.node = nodes.node
"""


@query("q145_khop_bowtie_profile", oracle=_KHOP_ORACLE)
def q145_khop_bowtie_profile(spark, sf_dir):
    """k-hop bow-tie profile of the web graph — the Broder et al. 2000
    "Graph structure in the Web" decomposition (IN / OUT / CORE /
    periphery), approximated by EXACT 2-hop reachability instead of
    full SCC computation (the production approximation: HyperBall-class
    sketches or bounded-hop sets, because exact SCC on one web-scale
    component is impractical — q96 holds the sketch leg, this query
    holds the exact bounded-hop leg). Per node: distinct nodes
    reachable within 2 forward hops, within 2 backward hops, and the
    quadrant class (both large = core-ish, forward-only = IN side,
    backward-only = OUT side, neither = periphery). All-BIGINT counts,
    set semantics exact (self excluded).

    Scale shape: 2-hop expansion = ONE edge self-join keyed by the
    middle node (fan-out bounded by out-degree; at fanout f the
    candidate set is f^2 per node, deduped map-side by DISTINCT), then
    two node-keyed counts. Going past 2 hops is where this blows up —
    which is exactly why q96's fixed-width registers exist; the pair
    documents the honest trade. Mega-hub middles skew the self-join:
    AQE skew-split on 16-byte rows, same as q80's contributions.
    Reference semantic: none — structure analysis an open crawl runs
    to know WHERE its frontier sits in the web's bow tie."""
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    edges = edges.localCheckpoint(eager=False)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    f2 = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .select(F.col("e1.src").alias("node"), F.col("e2.dst").alias("r"))
        .union(edges.select(F.col("src").alias("node"), F.col("dst").alias("r")))
        .distinct()
    )
    b2 = (
        e1.join(e2, F.col("e2.dst") == F.col("e1.src"))
        .filter(F.col("e2.src") != F.col("e1.dst"))
        .select(F.col("e1.dst").alias("node"), F.col("e2.src").alias("r"))
        .union(edges.select(F.col("dst").alias("node"), F.col("src").alias("r")))
        .distinct()
    )
    fc = f2.groupBy("node").agg(F.count(F.lit(1)).alias("fwd2"))
    bc = b2.groupBy("node").agg(F.count(F.lit(1)).alias("bwd2"))
    fwd = F.coalesce("fwd2", F.lit(0).cast("long"))
    bwd = F.coalesce("bwd2", F.lit(0).cast("long"))
    return (
        nodes.join(fc, "node", "left")
        .join(bc, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            fwd.alias("fwd2"),
            bwd.alias("bwd2"),
            F.when((fwd >= 3) & (bwd >= 3), "core")
            .when(fwd >= 3, "in_side")
            .when(bwd >= 3, "out_side")
            .otherwise("periphery")
            .alias("bowtie_class"),
        )
    )

# ------------------------------------------------------------------ q162
_BFS_SEED_MOD = 17
_BFS_ROUNDS = 3

_BFS_LAYER_SQL = """
l{i} AS (SELECT DISTINCT e.dst AS node FROM edges e JOIN r{p} ON r{p}.node = e.src),
r{i} AS (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM (
           SELECT node, d FROM r{p}
           UNION ALL SELECT node, {i} FROM l{i}) GROUP BY node)"""

_BFS_ORACLE = (
    f"""
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
r0 AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS d
       FROM documents WHERE doc_id % {_BFS_SEED_MOD} = 0),"""
    + ",".join(
        _BFS_LAYER_SQL.format(i=k, p=k - 1) for k in range(1, _BFS_ROUNDS + 1)
    )
    + f"""
SELECT nodes.node AS doc_id,
       COALESCE(r{_BFS_ROUNDS}.d, CAST(-1 AS BIGINT)) AS dist
FROM nodes LEFT JOIN r{_BFS_ROUNDS} ON r{_BFS_ROUNDS}.node = nodes.node
"""
)


@query("q162_seed_bfs_layers", oracle=_BFS_ORACLE)
def q162_seed_bfs_layers(spark, sf_dir, _capture=None):
    """Seed-reachability BFS layers — the static twin of the engine's
    live crawl loop (plans/crawl.py): which pages a crawl started from
    the seed list (doc_id % 17 = 0) can DISCOVER within 3 rounds, and at
    which round each page first appears. Per page: min-hop distance from
    the seed set (0 = seed, -1 = unreachable in 3 rounds) — the number a
    crawl planner reads as "round budget k reaches X% of the known
    graph" before spending any fetch budget, and the offline answer to
    q118's discovery-saturation question asked per-URL instead of
    per-round.

    Scale shape: DELTA-frontier BFS, the only formulation that survives
    web scale — each round joins ONLY the newly-discovered layer against
    the edge table (never the accumulated set), then anti-joins the
    running reached set to keep the frontier strictly new, exactly the
    engine's J2 seen-filter round (contract/crawl_ops.py:92) with the
    Bloom shards swapped for an exact key set. Per round that is one
    src-keyed equi-join (frontier-sized probe, broadcastable early
    rounds) + one node-keyed anti-join; localCheckpoint per round keeps
    the lineage flat at any round count (the q80 discipline). The min-d
    union-aggregate of the oracle is implied: a node enters `reached`
    the FIRST round it appears and the anti-join blocks every later
    sighting. Reference analog: the reference fixes its crawl universe
    as config allow-lists (config.py:15-72); an open crawl must compute
    reachability from its seeds.
    """
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    edges = edges.localCheckpoint(eager=False)
    reached = (
        nodes.filter(F.col("node") % _BFS_SEED_MOD == 0)
        .select("node", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint(eager=False)
    )
    frontier = reached.select("node")
    for i in range(1, _BFS_ROUNDS + 1):
        cand = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            cand.join(reached, "node", "left_anti")
            .select("node", F.lit(i).cast("long").alias("dist"))
        )
        if _capture is not None:
            _capture[f"q162.layer{i}"] = new
        new = new.localCheckpoint(eager=False)
        reached = reached.unionByName(new).localCheckpoint(eager=False)
        frontier = new.select("node")
    return nodes.join(reached, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("dist", F.lit(-1).cast("long")).alias("dist"),
    )



# ------------------------------------------------------------------ q179
_TRI_ORACLE = """
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        GROUP BY node),
orr AS (
  SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS a,
         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS b
  FROM und e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v),
tri AS (
  SELECT w.a, w.x, w.y
  FROM (SELECT o1.a AS a, o1.b AS x, o2.b AS y
        FROM orr o1 JOIN orr o2 ON o1.a = o2.a AND o1.b < o2.b) w
  JOIN und ON und.u = LEAST(w.x, w.y) AND und.v = GREATEST(w.x, w.y)),
cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
        FROM (SELECT a AS node FROM tri UNION ALL SELECT x AS node FROM tri
              UNION ALL SELECT y AS node FROM tri)
        GROUP BY node)
SELECT d.doc_id,
       CAST(COALESCE(g.deg, 0) AS BIGINT) AS deg,
       CAST(COALESCE(c.tri, 0) AS BIGINT) AS n_triangles,
       CASE WHEN COALESCE(g.deg, 0) >= 2
            THEN (2000 * COALESCE(c.tri, 0)) // (g.deg * (g.deg - 1))
            ELSE CAST(0 AS BIGINT) END AS lcc_permille
FROM documents d
LEFT JOIN deg g ON g.node = d.doc_id
LEFT JOIN cnt c ON c.node = d.doc_id
"""


@query("q179_triangle_clustering", oracle=_TRI_ORACLE)
def q179_triangle_clustering(spark, sf_dir):
    """Local triangle counting + clustering coefficient over the link
    graph — Becchetti et al. KDD 2008 ("Efficient semi-streaming
    algorithms for local triangle counting", used there explicitly for
    web-spam detection): link farms wire their members into cliques, so
    a page whose neighborhood is abnormally triangle-dense is trading
    links. Per node: undirected degree, EXACT triangle count, and the
    local clustering coefficient 2T/(deg*(deg-1)) in integer permille —
    the structural spam signal completing q121 (k-core), q130
    (reciprocity), q133 (assortativity). Exact integers end to end.

    Algorithm: the degree-orientation triangle count (Schank & Wagner
    2005; Suri & Vassilvitskii WWW 2011 — THE MapReduce formulation).
    Each undirected edge is stored once, oriented from its lower-
    (degree, id) endpoint to the higher; wedges fan out only from each
    edge's LOWER endpoint, and a wedge (a->x, a->y) plus the undirected
    closure edge {x,y} identifies each triangle exactly once (at its
    orientation-minimum vertex).

    Scale shape: orientation is what makes this survive mega-hubs — a
    node's wedge fan-out is its orientation OUT-degree, which is at most
    ~sqrt(2m) (each out-neighbor has degree >= the node's own), so the
    10^7-degree hub host generates ZERO wedges (all its edges orient
    INTO it) and the wedge self-join is provably skew-bounded without
    salting. Exchanges: the undirected dedup + degree rollup (edge/node
    keyed, map-side combined), the orientation join (node-keyed, the
    same key), the wedge self-join keyed by wedge CENTER, and the
    closure hash join keyed by the 16-byte edge pair — never adjacency
    lists, never all-pairs. Reference semantic: none — the reference's
    fixed source list has no graph; an open crawl discounts clique-y
    neighborhoods before authority flows (feeds q80/q98 like q130)."""
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    und = (
        edges.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)  # reused: degrees, orientation, closure
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    orr = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .localCheckpoint(eager=False)  # self-joined below
    )
    wed = (
        orr.select("a", F.col("b").alias("x"))
        .join(orr.select("a", F.col("b").alias("y")), "a")
        .filter(F.col("x") < F.col("y"))
    )
    tri = wed.join(
        und,
        (F.least("x", "y") == F.col("u")) & (F.greatest("x", "y") == F.col("v")),
    )
    cnt = (
        tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    return (
        nodes.join(deg, "node", "left")
        .join(cnt, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.coalesce("tri", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                F.expr("(2000 * coalesce(tri, 0)) div (deg * (deg - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_permille"),
        )
    )


# ------------------------------------------------------------------ q180
_AA_MAX_DEG = 10  # hub-center prune; production ~10^3 (weights ~1/ln deg)

_AA_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        GROUP BY node),
ctr AS (SELECT node, deg,
               CAST(floor(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w_micro
        FROM deg WHERE deg BETWEEN 2 AND {_AA_MAX_DEG}),
adjw AS (
  SELECT e.u AS w, e.v AS x, c.w_micro FROM und e JOIN ctr c ON c.node = e.u
  UNION ALL
  SELECT e.v AS w, e.u AS x, c.w_micro FROM und e JOIN ctr c ON c.node = e.v),
sc AS (
  SELECT a1.x AS x, a2.x AS y,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(a1.w_micro) AS BIGINT) AS aa_micro
  FROM adjw a1 JOIN adjw a2 ON a1.w = a2.w AND a1.x < a2.x
  GROUP BY a1.x, a2.x)
SELECT sc.x AS doc_a, sc.y AS doc_b, sc.n_common, sc.aa_micro
FROM sc LEFT JOIN und ON und.u = sc.x AND und.v = sc.y
WHERE und.u IS NULL
"""


@query("q180_adamic_adar_links", oracle=_AA_ORACLE)
def q180_adamic_adar_links(spark, sf_dir):
    """Adamic-Adar link prediction over the link graph — Adamic & Adar
    2003 ("Friends and neighbors on the Web"), the classic common-
    neighbor score production systems run at web scale (LinkedIn PYMK /
    Liben-Nowell & Kleinberg 2003): two pages sharing many LOW-degree
    common neighbors are likely related, so un-linked high-AA pairs are
    where a discovery crawler spends its next probes (seeds it q85/q162
    never reach by following links alone). Per non-adjacent pair:
    common-neighbor count and the AA score sum(1/ln(deg(w))) over common
    neighbors w, in integer micro-units — floor PER CENTER then exact
    integer SUM, so the score is order-independent and bit-identical
    cross-engine (q169's ln precedent: same double operand both
    engines).

    Hub pruning is part of the SPEC, not a shortcut: centers with
    degree > {_AA_MAX_DEG} (production ~10^3) are excluded before wedge
    generation — their per-pair contribution 1/ln(deg) is asymptotically
    nil while their wedge fan-out is quadratic, so production AA always
    prunes hubs (the q50 cap_buckets discipline: the cap is explicit,
    deterministic, and oracle-checked — the fixture's cap binds on real
    centers, pinned in tests).

    Scale shape: the wedge self-join is keyed by CENTER and the capped
    center fan-out bounds every group at C({_AA_MAX_DEG},2) pairs — no
    salting needed, the same skew argument as q179's orientation but by
    explicit cap; the adjacency frame carries (w, x, w_micro) 24-byte
    rows; the existing-edge exclusion is one edge-keyed left anti-join;
    the pair rollup is map-side combined on the 16-byte (x, y) key. No
    adjacency lists, no N^2. Reference semantic: none — the reference's
    fixed source list never discovers; an open crawl ranks where to
    look next."""
    edges, _nodes, _n1 = _link_graph(spark, sf_dir)
    und = (
        edges.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)  # reused: degrees, adjacency, exclusion
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ctr = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= _AA_MAX_DEG)
    ).select(
        "node",
        F.floor(F.lit(1000000.0) / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("w_micro"),
    )
    cu = ctr.select(F.col("node").alias("u"), "w_micro")
    cv = ctr.select(F.col("node").alias("v"), "w_micro")
    adjw = (
        und.join(cu, "u")
        .select(F.col("u").alias("w"), F.col("v").alias("x"), "w_micro")
        .unionByName(
            und.join(cv, "v").select(
                F.col("v").alias("w"), F.col("u").alias("x"), "w_micro"
            )
        )
        .localCheckpoint(eager=False)  # self-joined below
    )
    sc = (
        adjw.select("w", F.col("x"), "w_micro")
        .join(adjw.select("w", F.col("x").alias("y")), "w")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("w_micro").cast("long").alias("aa_micro"),
        )
    )
    return sc.join(
        und,
        (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")),
        "left_anti",
    ).select(
        F.col("x").alias("doc_a"),
        F.col("y").alias("doc_b"),
        "n_common",
        "aa_micro",
    )


# ------------------------------------------------------------------ q182
# Recrawl-priority capstone: how much of the fetch budget each URL
# deserves THIS cycle. Cho & Garcia-Molina (TODS 2003) schedule refresh
# by change rate x importance; OPIC (q122) supplies the importance the
# crawler learned online, the fetch log supplies the change estimate.
_RP_SHARE = 4  # budget = n_urls div 4 fetch slots per cycle


@query(
    "q182_recrawl_priority",
    oracle=f"""
    WITH imp AS (SELECT doc_id, importance_pico FROM ({_OPIC_ORACLE})),
    f AS (
      SELECT user_id % 200 AS url_id, ts, event_id,
             CAST(floor(value) AS BIGINT) % 2 AS sk,
             lag(CAST(floor(value) AS BIGINT) % 2)
               OVER (PARTITION BY user_id % 200
                     ORDER BY ts ASC, event_id ASC) AS prev
      FROM events),
    per AS (
      SELECT url_id,
             CAST(COUNT(*) AS BIGINT) AS n_fetches,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND sk <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM f GROUP BY url_id),
    h AS (SELECT MAX(ts) AS horizon FROM events),
    base AS (
      SELECT imp.doc_id AS url_id,
             CAST(imp.importance_pico // 1000000 AS BIGINT) AS importance_micro,
             CAST(COALESCE(per.n_fetches, 0) AS BIGINT) AS n_fetches,
             CAST(COALESCE(per.n_changes, 0) AS BIGINT) AS n_changes,
             CAST(CASE WHEN per.url_id IS NULL THEN 0
                  ELSE date_diff('second', per.last_ts, h.horizon)
                  END AS BIGINT) AS staleness_s,
             CAST(CASE WHEN per.url_id IS NULL THEN 1000
                  ELSE (1000 * (per.n_changes + 1)) // (per.n_fetches + 1)
                  END AS BIGINT) AS cr_permille,
             CAST(CASE WHEN per.url_id IS NULL THEN 1000
                  ELSE LEAST(1000,
                    (((1000 * (per.n_changes + 1)) // (per.n_fetches + 1))
                     * CAST(date_diff('second', per.last_ts, h.horizon) AS BIGINT))
                    // GREATEST(
                         CAST(date_diff('second', per.first_ts, per.last_ts)
                              AS BIGINT)
                         // GREATEST(per.n_fetches - 1, 1), 1))
                  END AS BIGINT) AS risk_permille
      FROM imp LEFT JOIN per ON per.url_id = imp.doc_id CROSS JOIN h),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_urls FROM base),
    ranked AS (
      SELECT *, importance_micro * risk_permille AS gain_units,
             ROW_NUMBER() OVER (ORDER BY importance_micro * risk_permille DESC,
                                url_id ASC) AS fetch_rank
      FROM base)
    SELECT url_id, n_fetches, n_changes, staleness_s, cr_permille,
           risk_permille, importance_micro, gain_units,
           CAST(fetch_rank AS BIGINT) AS fetch_rank,
           (fetch_rank <= g.n_urls // {_RP_SHARE}) AS selected
    FROM ranked CROSS JOIN g
    """,
)
def q182_recrawl_priority(spark, sf_dir, _capture=None):
    """Recrawl-priority capstone — the cycle scheduler's answer to "which
    URLs get this round's fetch slots": expected gain = OPIC importance
    (q122, learned online while crawling) x the probability the page has
    changed since its last fetch, estimated from the fetch log (Cho &
    Garcia-Molina, TODS 2003: refresh ordering by change frequency and
    importance — public literature). Per URL:

    - cr_permille: Laplace-smoothed per-interval change rate
      (n_changes+1)/(n_fetches+1) in permille over consecutive-fetch
      content-sketch transitions (sketch = floor(value) mod 2 — the
      coarse digest a crawler stores per fetch, q82's estimator family);
    - risk_permille: probability the page changed since last fetch,
      linearized as cr x (staleness / mean inter-fetch gap), clamped at
      1000 (the integer stand-in for 1 - exp(-lambda*t): monotone, equal
      at 0, saturating — and bit-exact cross-engine, where exp is NOT);
    - NEVER-fetched URLs (the discovery queue) carry risk = 1000: a page
      we have no copy of is stale by definition, so discovery and
      refresh compete in ONE ranking on equal terms — the unified
      frontier Cho-GM argue for;
    - gain_units = importance_micro x risk_permille (all BIGINT), ranked
      with a total tiebreak; the top n_urls div {_RP_SHARE} win the
      cycle's fetch slots (selected).

    The global rank is operators/ordinals.py sharded_ordinal sharded by
    the gain's bit-length bucket (monotone along the descending order) —
    NO unpartitioned window: at 10^10 URLs the rank runs shard-parallel,
    while the oracle's single ROW_NUMBER is the same total order by
    construction. ONE url-keyed exchange serves lag window + rollup
    (q82's audited shape); the importance join is doc-id keyed against
    q122's skinny output; horizon is a 1-row broadcast.

    Reference semantic: the reference re-scrapes every source every run
    (parallel_scraper_manager.py:140-178) with hard-coded priorities
    (config.py:15-72); this is the incremental scheduler that replaces
    both — importance learned from links, refresh need learned from
    observed change history."""
    imp = q122_opic_importance(spark, sf_dir).select(
        "doc_id", F.expr("importance_pico div 1000000").alias("importance_micro")
    )
    e = t(spark, sf_dir, "events").select(
        (F.col("user_id") % 200).alias("url_id"),
        "ts",
        "event_id",
        (F.floor("value").cast("long") % 2).alias("sk"),
    )
    w = Window.partitionBy("url_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    per = (
        e.withColumn("prev", F.lag("sk").over(w))
        .groupBy("url_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.sum(
                (F.col("prev").isNotNull() & (F.col("sk") != F.col("prev"))).cast(
                    "long"
                )
            ).alias("n_changes"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    # horizon = max ts over the log = max of the per-URL tails: derive it
    # from the skinny rollup (O(urls) rows) instead of a second full
    # events scan — the same derivation the streaming twin uses
    hor = per.agg(F.max("last_ts").alias("horizon"))
    return recrawl_rank(imp, per, hor, _capture=_capture)


def recrawl_rank(imp, per, hor, _capture=None):
    """The gain/rank tail of q182, shared with the streaming twin
    (streaming/recrawl.py): given the learned importance table
    (doc_id, importance_micro), per-URL fetch statistics
    (url_id, n_fetches, n_changes, first_ts, last_ts) — however they
    were accumulated — and the 1-row horizon, produce the full ranked
    fetch-slot allocation. Keeping this in one place pins stream ≡
    batch by construction: the twins differ only in how `per` is
    built (full-log window vs incremental delta rollup)."""
    from ..operators.ordinals import sharded_ordinal

    stale = (F.unix_timestamp("horizon") - F.unix_timestamp("last_ts")).cast("long")
    cr = F.expr("(1000 * (n_changes + 1)) div (n_fetches + 1)")
    gap = F.greatest(
        F.expr(
            "(unix_timestamp(last_ts) - unix_timestamp(first_ts))"
            " div greatest(n_fetches - 1, 1L)"
        ),
        F.lit(1).cast("long"),
    )
    fetched = F.col("url_id").isNotNull()
    base = (
        imp.join(per, imp["doc_id"] == per["url_id"], "left")
        .crossJoin(F.broadcast(hor))
        .select(
            F.col("doc_id").alias("url_id"),
            "importance_micro",
            F.coalesce("n_fetches", F.lit(0)).cast("long").alias("n_fetches"),
            F.coalesce("n_changes", F.lit(0)).cast("long").alias("n_changes"),
            F.when(fetched, stale).otherwise(F.lit(0)).cast("long").alias(
                "staleness_s"
            ),
            F.when(fetched, cr).otherwise(F.lit(1000)).cast("long").alias(
                "cr_permille"
            ),
            F.when(
                fetched,
                F.least(F.lit(1000).cast("long"), F.expr(
                    "(((1000 * (n_changes + 1)) div (n_fetches + 1))"
                    " * (unix_timestamp(horizon) - unix_timestamp(last_ts)))"
                    " div greatest((unix_timestamp(last_ts)"
                    " - unix_timestamp(first_ts))"
                    " div greatest(n_fetches - 1, 1L), 1L)"
                )),
            )
            .otherwise(F.lit(1000))
            .cast("long")
            .alias("risk_permille"),
        )
        .withColumn(
            "gain_units", F.col("importance_micro") * F.col("risk_permille")
        )
    )
    if _capture is not None:
        _capture["q182.base"] = base
    # sharded_ordinal evaluates its input three times (local ranks,
    # shard counts, grand total); base is EXPENSIVE (the events lag
    # window + the unrolled OPIC training join), so stage it — the
    # q80/kmeans idiom the operator's docstring prescribes
    base = base.localCheckpoint(eager=False)
    ranked = sharded_ordinal(
        base,
        [F.col("gain_units").desc(), F.col("url_id").asc()],
        shard=-F.length(
            F.conv((F.col("gain_units") + 1).cast("string"), 10, 2)
        ).cast("long"),
        out="fetch_rank",
        total="n_urls",
    )
    return ranked.select(
        "url_id",
        "n_fetches",
        "n_changes",
        "staleness_s",
        "cr_permille",
        "risk_permille",
        "importance_micro",
        "gain_units",
        "fetch_rank",
        (F.col("fetch_rank") <= F.expr(f"n_urls div {_RP_SHARE}")).alias("selected"),
    )


# ------------------------------------------------------------------ q183
# Crawl-ordering strategy evaluation: which frontier priority finds the
# important pages FIRST. Cho, Garcia-Molina & Page (WWW 1998, "Efficient
# Crawling Through URL Ordering") compare orderings by how quickly the
# crawl accumulates hot-page mass; here the hot mass is the OPIC
# importance (q122) and the orderings are the priorities a frontier
# could actually rank by.
_COE_K = 10  # budget deciles

_COE_STRATEGIES_SQL = """
      SELECT 'random' AS strategy, doc_id, importance_pico,
             NTILE({k}) OVER (ORDER BY rnd ASC, doc_id ASC) AS decile
      FROM base
      UNION ALL
      SELECT 'indegree', doc_id, importance_pico,
             NTILE({k}) OVER (ORDER BY ind DESC, doc_id ASC)
      FROM base
      UNION ALL
      SELECT 'outdegree', doc_id, importance_pico,
             NTILE({k}) OVER (ORDER BY outd DESC, doc_id ASC)
      FROM base
      UNION ALL
      SELECT 'opic', doc_id, importance_pico,
             NTILE({k}) OVER (ORDER BY importance_pico DESC, doc_id ASC)
      FROM base
"""


@query(
    "q183_crawl_order_eval",
    oracle=f"""
    WITH imp AS (SELECT doc_id, importance_pico FROM ({_OPIC_ORACLE})),
    n AS (SELECT COUNT(*) AS nn FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT d.doc_id AS src,
               CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                    || CAST(u.j AS VARCHAR)), 1, 8) AS BIGINT) % n.nn AS dst
        FROM documents d CROSS JOIN n
        CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
      WHERE dst <> src),
    indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS c FROM edges GROUP BY dst),
    outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS c FROM edges GROUP BY src),
    base AS (
      SELECT imp.doc_id, imp.importance_pico,
             COALESCE(i.c, 0) AS ind, COALESCE(o.c, 0) AS outd,
             md5(CAST(imp.doc_id AS VARCHAR)) AS rnd
      FROM imp LEFT JOIN indeg i ON i.dst = imp.doc_id
               LEFT JOIN outdeg o ON o.src = imp.doc_id),
    ranked AS ({_COE_STRATEGIES_SQL.format(k=_COE_K)}),
    tot AS (SELECT SUM(importance_pico) AS t FROM base),
    per AS (
      SELECT strategy, CAST(decile AS BIGINT) AS decile,
             SUM(importance_pico) AS cap
      FROM ranked GROUP BY strategy, decile)
    SELECT strategy, decile,
           CAST((1000 * cap) // tot.t AS BIGINT) AS captured_permille,
           CAST((1000 * SUM(cap) OVER (PARTITION BY strategy ORDER BY decile))
                // tot.t AS BIGINT) AS cum_captured_permille
    FROM per CROSS JOIN tot
    """,
)
def q183_crawl_order_eval(spark, sf_dir, _capture=None):
    """Crawl-ordering strategy evaluation (Cho, Garcia-Molina & Page,
    WWW 1998 — public literature): rank the corpus under four frontier
    priorities — random (md5 of the id), in-degree (backlink count, the
    paper's best cheap signal), out-degree (a plausible-but-bad hub
    heuristic), and the OPIC importance itself (the ceiling: ordering by
    the very mass being measured) — split each ordering into {_COE_K}
    fetch-budget deciles, and report per (strategy, decile) the
    importance mass captured in that slice and cumulatively, in
    permille of the total. The cumulative curves are the paper's
    hot-page acquisition plot: a steeper early curve = a frontier that
    spends its fetch budget on pages that matter.

    All mass arithmetic is BIGINT picocash (q122's units), so sums are
    exact under any partitioning and the permille division is bit-equal
    cross-engine. Each ordering's global rank is
    operators/ordinals.py sharded_ordinal (bit-length / hash-prefix
    shards, monotone along the order — NO unpartitioned window), decile
    assignment is ntile_expr (bit-exact ANSI NTILE); the cumulative sum
    runs over {_COE_K} rows per strategy, partitioned BY strategy. The
    scored base frame (one importance join + two degree joins) is
    staged once (localCheckpoint, exposed via ``_capture``) and reused
    by all four orderings.

    Reference semantic: the reference fixes its visit order in a config
    dict (config.py:15-72, parallel_scraper_manager.py:140-178); this
    is the measurement that tells an open crawl WHICH priority signal
    earns its keep before committing a 10^10-URL fetch budget to it."""
    from ..operators.ordinals import ntile_expr, sharded_ordinal

    edges, _nodes, _n1 = _link_graph(spark, sf_dir)
    imp = q122_opic_importance(spark, sf_dir).select("doc_id", "importance_pico")
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).cast("long").alias("ind"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outd"))
    base = (
        imp.join(indeg, imp["doc_id"] == indeg["dst"], "left")
        .join(outdeg, imp["doc_id"] == outdeg["src"], "left")
        .select(
            "doc_id",
            "importance_pico",
            F.coalesce("ind", F.lit(0)).cast("long").alias("ind"),
            F.coalesce("outd", F.lit(0)).cast("long").alias("outd"),
            F.md5(F.col("doc_id").cast("string")).alias("rnd"),
        )
    )
    if _capture is not None:
        _capture["q183.base"] = base
    # four sharded_ordinal passes read base (the OPIC training join);
    # stage it once — the operator docstring's prescription
    base = base.localCheckpoint(eager=False)
    # descending-count shard: bit-length bucket, monotone along the order
    blen = lambda c: -F.length(  # noqa: E731
        F.conv((F.col(c) + 1).cast("string"), 10, 2)
    ).cast("long")
    plans = [
        ("random", [F.col("rnd").asc(), F.col("doc_id").asc()],
         F.conv(F.substring("rnd", 1, 2), 16, 10).cast("long")),
        ("indegree", [F.col("ind").desc(), F.col("doc_id").asc()], blen("ind")),
        ("outdegree", [F.col("outd").desc(), F.col("doc_id").asc()], blen("outd")),
        ("opic", [F.col("importance_pico").desc(), F.col("doc_id").asc()],
         blen("importance_pico")),
    ]
    parts = []
    for strat, order, shard in plans:
        r = sharded_ordinal(base, order, shard=shard, out="rk", total="nd")
        parts.append(
            r.select(
                F.lit(strat).alias("strategy"),
                ntile_expr("rk", "nd", _COE_K).alias("decile"),
                "importance_pico",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    tot = base.agg(F.sum("importance_pico").alias("t"))
    per = u.groupBy("strategy", "decile").agg(
        F.sum("importance_pico").alias("cap")
    )
    w = (
        Window.partitionBy("strategy")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum("cap").over(w))
        .select(
            "strategy",
            "decile",
            F.expr("(1000 * cap) div t").alias("captured_permille"),
            F.expr("(1000 * cum) div t").alias("cum_captured_permille"),
        )
    )


# ------------------------------------------------------------------ q185
_LPA_ITERS = 3

_LPA_ITER_SQL = """
c{i} AS (SELECT adj.a, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM adj JOIN l{p} l ON l.node = adj.b GROUP BY adj.a, l.label),
l{i} AS (SELECT a AS node, label FROM (
           SELECT a, label,
                  row_number() OVER (PARTITION BY a
                                     ORDER BY cnt DESC, label) AS rk
           FROM c{i}) WHERE rk = 1)"""

_LPA_ORACLE = (
    """
WITH n AS (SELECT COUNT(*) AS nn FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(u.j AS VARCHAR)), 1, 8)
                AS BIGINT) % n.nn AS dst
    FROM documents d CROSS JOIN n CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS j) u)
  WHERE dst <> src),
und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges),
adj AS (SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM adj),
"""
    + ",".join(_LPA_ITER_SQL.format(i=i, p=i - 1) for i in range(1, _LPA_ITERS + 1))
    + f""",
fin AS (SELECT d.doc_id,
               CAST(COALESCE(l.label, d.doc_id) AS BIGINT) AS community
        FROM documents d LEFT JOIN l{_LPA_ITERS} l ON l.node = d.doc_id),
sz AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS community_size
       FROM fin GROUP BY community)
SELECT f.doc_id, f.community, sz.community_size
FROM fin f JOIN sz USING (community)
"""
)


@query("q185_label_propagation_communities", oracle=_LPA_ORACLE)
def q185_label_propagation_communities(spark, sf_dir, _capture=None):
    """Label-propagation community detection over the link graph —
    Raghavan, Albert & Kumara 2007 (Phys. Rev. E: near-linear-time
    communities by iterated neighbor-majority voting), the SYNCHRONOUS
    deterministic variant: every node simultaneously adopts the most
    frequent label among its neighbors, ties broken by smallest label,
    3 fixed rounds from the identity labeling (the q80 power-iteration
    discipline — a fixed unrolled horizon both engines replay exactly;
    the randomized-sweep variant of the paper is not cluster-
    reproducible, so a distributed engine ships the synchronous one).
    Labels are node ids, so converged labels name a canonical member.
    Communities are the spam/mirror-farm surface q121 (k-core) and q130
    (reciprocity) score structurally: a link farm label-collapses into
    one community within 2-3 rounds, and frontier sharding by community
    co-locates intra-farm edges. Output: per page its community and the
    community size — exact integers end to end.

    Scale shape: the adjacency (both directions of the deduped
    undirected edge set) is staged ONCE (localCheckpoint — the kmeans/
    q80 barrier); each round is (1) a node-keyed join of the skinny
    (node, label) frame onto adjacency — the SAME key every round, AQE
    skew-splits mega-hub in-neighborhoods, (2) a (node, label) count
    aggregate that map-side combines (a hub fed from f farm members
    arrives as <= distinct-labels rows per mapper, not degree rows), and
    (3) a per-node struct-min argmax — never adjacency lists, never
    label vectors. Per-round cost is O(|E|) exchange of 3-long rows;
    labels state is O(|V|) — at 10^10 edges each round is one co-
    partitioned shuffle. Reference semantic: none — the reference's
    fixed source list has no graph (parallel_scraper_manager.py drives
    independent scrapers); an open crawl groups hosts into communities
    before trusting intra-community links (feeds q98's trust
    propagation like q130)."""
    edges, nodes, _n1 = _link_graph(spark, sf_dir)
    und = edges.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    adj = (
        und.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(und.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=False)  # reused by every propagation round
    )
    lab = adj.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for k in range(1, _LPA_ITERS + 1):
        cnt = (
            adj.join(lab.withColumnRenamed("node", "b"), "b")
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        upd = (
            cnt.groupBy("a")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("label").alias("lb")
                    )
                ).alias("m")
            )
            .select(F.col("a").alias("node"), F.col("m.lb").alias("label"))
        )
        if _capture is not None:
            _capture[f"q185.round{k}"] = upd
        lab = upd.localCheckpoint(eager=False)  # next round re-reads it
    fin = nodes.join(lab, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("label", F.col("node")).cast("long").alias("community"),
    )
    sz = fin.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return fin.join(sz, "community").select("doc_id", "community", "community_size")
