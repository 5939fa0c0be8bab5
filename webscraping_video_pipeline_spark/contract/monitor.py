"""Frontier monitoring & budget-allocation operators (round 4, session 5):
the bounded-memory observability layer a production crawl runs NEXT TO the
frontier — the reference tracks per-source success/failure counters in a
driver-local dict (parallel_scraper_manager.py:60-75, progress_monitor.py);
at 10^10 URLs those counters must become mergeable distributed sketches and
exact distributed selections:

- **q101 count-min-sketch heavy-hitter hosts**: the classic bounded-memory
  frequent-item sketch over the fetch stream — O(d*w) state no matter how
  many distinct hosts, additive cells so per-partition partial sketches
  map-side combine into the global sketch bit-exactly. Flags hosts whose
  ESTIMATE crosses phi*N; the exact counts exist here only so the oracle
  can check the one-sided error (est >= exact always).
- **q102 exact fetch-latency percentiles by distributed selection**: the
  k-th order statistic (P50/P90/P99) WITHOUT a global sort — per-bucket
  histogram (map-side combined), cumulative counts over the tiny bucket
  table, then a row_number confined to the single bucket holding each
  target rank. No stage ever sorts more than one bucket's rows.
- **q103 max-min fair crawl-budget allocation (water-filling)**: split a
  global fetch budget across hosts so no host is starved and no host gets
  more than it demands — the water-level threshold found in closed form
  from the demand-sorted prefix sums, remainder distributed
  deterministically by host hash. All-integer arithmetic end to end.

Cross-engine determinism: CMS hash cells are md5-derived (same bytes both
engines); selection does NO arithmetic on latency doubles (ordering + pick
only, so bit-identical); the water-filling is BIGINT throughout with
`div`/`//` integer division and a (demand, host) total order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

# ------------------------------------------------------------------ q101
_CMS_D = 4  # sketch depth (rows)
_CMS_W = 64  # sketch width (columns per row)
_CMS_PHI = 50  # heavy hitter = estimate >= N/_CMS_PHI

# Skewed synthetic host stream shared by Spark and SQL: small residues are
# exponentially more likely, so a handful of mega-hosts dominate — the skew
# shape the sketch exists to catch.
_CMS_KEYS_SQL = """
    SELECT 'h' || CAST(user_id % (1 + (event_id % 47)) AS VARCHAR) AS host
    FROM events
"""

_CMS_ORACLE = f"""
WITH k AS ({_CMS_KEYS_SQL}),
d AS (SELECT UNNEST([1, 2, 3, 4]) AS depth),
cells AS (
  SELECT CAST(d.depth AS BIGINT) AS depth,
         CAST('0x' || substr(md5(CAST(d.depth AS VARCHAR) || '|' || k.host), 1, 8)
              AS BIGINT) % {_CMS_W} AS col
  FROM k CROSS JOIN d),
cms AS (SELECT depth, col, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY depth, col),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM k),
exact AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM k GROUP BY host),
est AS (
  SELECT e.host, MIN(c.cnt) AS est_cnt
  FROM exact e CROSS JOIN d
  JOIN cms c ON c.depth = d.depth
            AND c.col = CAST('0x' || substr(md5(CAST(d.depth AS VARCHAR) || '|' || e.host), 1, 8)
                             AS BIGINT) % {_CMS_W}
  GROUP BY e.host)
SELECT e.host,
       est.est_cnt,
       e.exact_cnt,
       est.est_cnt - e.exact_cnt AS overcount
FROM exact e JOIN est ON est.host = e.host CROSS JOIN n
WHERE est.est_cnt * {_CMS_PHI} >= n.total
"""


def _cms_col(depth_col, host_col):
    """CMS column index: first 8 md5 hex digits of 'depth|host' mod width —
    the md5-derived-bits idiom every cross-engine hash in this repo uses."""
    h = F.md5(F.concat(depth_col.cast("string"), F.lit("|"), host_col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CMS_W).alias("col")


@query("q101_cms_heavy_hitters", oracle=_CMS_ORACLE)
def q101_cms_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy-hitter hosts over the fetch stream: build a
    4x64 additive sketch (one groupBy over 256 cells — map-side combined,
    so each partition reduces to <=256 rows before the shuffle), estimate
    every candidate host as the MIN over its 4 cells, and flag hosts whose
    estimate crosses total/50.

    At 10^10 URLs the sketch is the ONLY thing that moves: O(d*w) cells
    regardless of distinct-host cardinality, and cell counts are additive
    so partial sketches merge bit-exactly (the distributed twin of the
    reference's driver-local per-source counters,
    parallel_scraper_manager.py:60-75). The exact per-host counts computed
    alongside exist ONLY so the oracle can certify the sketch's one-sided
    guarantee (est >= exact, overcount >= 0); the production shape queries
    the 256-cell broadcast sketch alone.
    """
    ev = t(spark, sf_dir, "events")
    k = ev.select(
        F.concat(
            F.lit("h"),
            (F.col("user_id") % (1 + (F.col("event_id") % 47))).cast("string"),
        ).alias("host")
    )
    depths = F.explode(F.array(*[F.lit(i) for i in range(1, _CMS_D + 1)]))
    # exact is the ONLY corpus-grain aggregate; staged because the sketch,
    # the estimates and the final report all read it
    exact = k.groupBy("host").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    ).localCheckpoint(eager=False)
    # Cell counts folded from the host rollup instead of hashing every
    # event row x depth (r6, guide §2.3 aggregate-before-you-explode):
    # count(events in cell) == sum over hosts in the cell of the host's
    # event count — the same sum re-associated, so the sketch is
    # bit-identical while md5 runs once per (host, depth), not once per
    # (event, depth) (measured: 4*10^6 interpreted md5+conv on a 3-task
    # scan = 5.7s of the query's 6.4s at 10x). The production additive
    # arm keeps the per-partition map-side cell merge the docstring
    # describes; here the certified per-host table is computed anyway.
    cells = exact.select("host", "exact_cnt", depths.alias("depth")).select(
        "exact_cnt",
        F.col("depth").cast("long").alias("depth"),
        _cms_col(F.col("depth"), F.col("host")),
    )
    cms = cells.groupBy("depth", "col").agg(F.sum("exact_cnt").alias("cnt"))
    n1 = exact.agg(F.sum("exact_cnt").alias("total"))
    est = (
        exact.select("host", depths.alias("depth"))
        .select(
            "host",
            F.col("depth").cast("long").alias("depth"),
            _cms_col(F.col("depth"), F.col("host")),
        )
        .join(F.broadcast(cms), ["depth", "col"])
        .groupBy("host")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return (
        exact.join(est, "host")
        .crossJoin(F.broadcast(n1))
        .filter(F.col("est_cnt") * _CMS_PHI >= F.col("total"))
        .select(
            "host",
            "est_cnt",
            "exact_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
    )


# ------------------------------------------------------------------ q102
_PCTS = (50, 90, 99)

_PCT_ORACLE = f"""
WITH v AS (SELECT event_id, value AS latency_ms FROM events),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM v),
r AS (SELECT event_id, latency_ms,
             ROW_NUMBER() OVER (ORDER BY latency_ms, event_id) AS rn
      FROM v),
p AS (SELECT UNNEST([{", ".join(str(p) for p in _PCTS)}]) AS pct)
SELECT CAST(p.pct AS BIGINT) AS pct,
       n.total AS n_total,
       (CAST(p.pct AS BIGINT) * n.total + 99) // 100 AS k_rank,
       r.latency_ms,
       r.event_id AS witness_event
FROM p CROSS JOIN n
JOIN r ON r.rn = (CAST(p.pct AS BIGINT) * n.total + 99) // 100
"""


@query("q102_latency_percentiles", oracle=_PCT_ORACLE)
def q102_latency_percentiles(spark, sf_dir):
    """Exact fetch-latency percentiles (P50/P90/P99) by DISTRIBUTED
    SELECTION — the k-th order statistic without ever globally sorting the
    latency column. Three stages: (1) per-bucket histogram (bucket =
    floor(latency), one map-side-combined groupBy to a few hundred rows);
    (2) cumulative counts over the tiny bucket table locate, for each
    target rank k = ceil(pct*n/100), the single bucket holding it and the
    within-bucket offset; (3) a row_number window PARTITIONED BY bucket,
    computed only on rows semi-joined into the <=3 needed buckets, picks
    the element at that offset.

    At 10^10 fetch records the oracle's full-sort formulation collapses to
    one task; here no stage sorts more than one bucket (and the bucket
    width is a dial). Selection does no arithmetic on the double values —
    ordering + pick only — so the result is bit-identical across engines;
    rank math is all-BIGINT ((pct*n + 99) div 100). Ties break on
    (latency, event_id), making the witness row deterministic too.
    Reference analog: the scrape-duration stats the progress monitor
    prints (progress_monitor.py) — medians there, exact P99 here.
    """
    v = t(spark, sf_dir, "events").select(
        "event_id", F.col("value").alias("latency_ms")
    )
    n1 = v.agg(F.count(F.lit(1)).alias("total"))
    pcts = n1.select(
        "total",
        F.explode(F.array(*[F.lit(p) for p in _PCTS])).alias("pct0"),
    ).select(
        F.col("pct0").cast("long").alias("pct"),
        "total",
        F.expr("(cast(pct0 as bigint) * total + 99) div 100").alias("k_rank"),
    )
    b = v.groupBy(F.floor("latency_ms").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.select(
        "bucket", "cnt", F.sum("cnt").over(w_cum).alias("cum")
    )  # bucket table is O(#buckets) rows — a constant, never corpus-sized
    hit = (
        F.broadcast(pcts)
        .join(cum, F.col("cum") >= F.col("k_rank"))
        .groupBy("pct", "total", "k_rank")
        .agg(F.min("bucket").alias("bucket"))
        .join(cum.select("bucket", (F.col("cum") - F.col("cnt")).alias("below")), "bucket")
        .select(
            "pct",
            "total",
            "k_rank",
            "bucket",
            (F.col("k_rank") - F.col("below")).alias("offset"),
        )
    )
    # partition by (bucket, pct): two target ranks can land in the SAME
    # bucket, and the hit-join then carries one copy of each row per pct —
    # numbering must restart per pct or the copies interleave
    w_in = Window.partitionBy("bucket", "pct").orderBy("latency_ms", "event_id")
    picked = (
        v.withColumn("bucket", F.floor("latency_ms").cast("long"))
        .join(F.broadcast(hit), "bucket")
        .withColumn("rn", F.row_number().over(w_in))
        .filter(F.col("rn") == F.col("offset"))
    )
    return picked.select(
        "pct",
        F.col("total").alias("n_total"),
        "k_rank",
        "latency_ms",
        F.col("event_id").alias("witness_event"),
    )


# ------------------------------------------------------------------ q103
_WF_HOSTS = 211  # synthetic host count dial
_WF_SHARE = 3  # budget = total demand div _WF_SHARE

_WF_ORACLE = f"""
WITH k AS (SELECT 'h' || CAST(o_custkey % {_WF_HOSTS} AS VARCHAR) AS host FROM orders),
dem AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS demand FROM k GROUP BY host),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(demand) AS BIGINT) AS tot,
             CAST(SUM(demand) AS BIGINT) // {_WF_SHARE} AS budget
      FROM dem),
s AS (SELECT host, demand,
             ROW_NUMBER() OVER (ORDER BY demand, host) AS i,
             COALESCE(SUM(demand) OVER (ORDER BY demand, host
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      CAST(0 AS BIGINT)) AS sp
      FROM dem),
star AS (SELECT s.i, s.sp FROM s CROSS JOIN g
         WHERE s.demand * (g.n - s.i + 1) + s.sp > g.budget
         ORDER BY s.i LIMIT 1),
lvl AS (SELECT COALESCE((SELECT (g.budget - star.sp) // (g.n - star.i + 1)
                         FROM star CROSS JOIN g),
                        (SELECT MAX(demand) FROM dem)) AS t),
base AS (SELECT dem.host, dem.demand,
                CASE WHEN dem.demand < lvl.t THEN dem.demand ELSE lvl.t END AS alloc0,
                dem.demand > lvl.t AS capped
         FROM dem CROSS JOIN lvl),
rem AS (SELECT g.budget - (SELECT SUM(alloc0) FROM base) AS r FROM g),
bonus AS (SELECT host, ROW_NUMBER() OVER (ORDER BY md5(host), host) AS j
          FROM base WHERE capped)
SELECT b.host, b.demand,
       CAST(b.alloc0 + CASE WHEN bo.j IS NOT NULL AND bo.j <= rem.r
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc,
       b.capped
FROM base b LEFT JOIN bonus bo ON bo.host = b.host CROSS JOIN rem
"""


@query("q103_fair_budget_allocation", oracle=_WF_ORACLE)
def q103_fair_budget_allocation(spark, sf_dir):
    """Max-min fair crawl-budget allocation (water-filling): split a global
    fetch budget B = total_demand div 3 across hosts so every host gets
    min(demand, T) for the unique integer water level T with
    sum(min(demand, T)) <= B, then hand the integer remainder out one unit
    each to the capped hosts in md5(host) order — fully deterministic,
    all-BIGINT. The closed form: sort hosts by (demand, host) with
    exclusive prefix sums sp_i; the first position where
    demand_i*(n-i+1) + sp_i > B starts the capped segment, and
    T = (B - sp_i) div (n-i+1). If no position trips, demand is fully
    fundable and T = max(demand).

    Scale shape: the only corpus-sized work is the demand groupBy (10^10
    URLs -> one shuffle to #hosts rows); everything after runs on the
    per-host table, orders of magnitude smaller. Round 5: the ordered
    prefix scan over hosts is operators/ordinals.py sharded_prefix_sum
    (sharded by floor_log2(demand) — monotone along the demand order),
    and the remainder hand-out rank is sharded_ordinal on the md5 key's
    leading byte (the q144 idiom) — NO unpartitioned window remains, so
    the allocator itself now scales to 10^8+ hosts, not just the
    frontier it allocates. The water level is ONE row broadcast back.
    Reference analog: the fixed per-source target counts in
    config.py:15-72 — here derived, fair, and starvation-free.
    """
    from ..operators.ordinals import sharded_ordinal, sharded_prefix_sum
    k = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("h"), (F.col("o_custkey") % _WF_HOSTS).cast("string")
        ).alias("host")
    )
    # the per-host demand table is the ONE corpus-sized reduction; stage
    # it so the five downstream readers (totals, prefix scan, water
    # level, remainder, bonus) never re-scan the frontier
    dem = (
        k.groupBy("host")
        .agg(F.count(F.lit(1)).alias("demand"))
        .localCheckpoint(eager=False)
    )
    g = dem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("demand").alias("tot"),
        F.expr(f"sum(demand) div {_WF_SHARE}").alias("budget"),
    )
    s = sharded_prefix_sum(
        dem,
        [F.col("demand").asc(), F.col("host").asc()],
        shard=F.expr("length(conv(cast(demand as string), 10, 2)) - 1").cast("long"),
        value=F.col("demand"),
        out="cum",
        ordinal="i",
    ).select("host", "demand", "i", (F.col("cum") - F.col("demand")).alias("sp"))
    star = (
        s.crossJoin(F.broadcast(g))
        .filter(F.col("demand") * (F.col("n") - F.col("i") + 1) + F.col("sp") > F.col("budget"))
        .orderBy("i")
        .limit(1)
        .select(
            F.expr("(budget - sp) div (n - i + 1)").alias("t")
        )
    )
    tmax = dem.agg(F.max("demand").alias("t"))
    # water level: the capped-segment closed form if any host trips, else
    # max demand (fully fundable) — union + min keeps it one broadcast row
    lvl = star.unionByName(tmax).orderBy("t").limit(1)
    base = dem.crossJoin(F.broadcast(lvl)).select(
        "host",
        "demand",
        F.least(F.col("demand"), F.col("t")).alias("alloc0"),
        (F.col("demand") > F.col("t")).alias("capped"),
    )
    rem = base.crossJoin(F.broadcast(g)).agg(
        (F.first("budget") - F.sum("alloc0")).alias("r")
    )
    bonus = sharded_ordinal(
        base.filter("capped").select("host", F.md5("host").alias("mk")),
        [F.col("mk").asc(), F.col("host").asc()],
        shard=F.expr("cast(conv(substr(mk, 1, 2), 16, 10) as long)"),
        out="j",
    ).select("host", "j")
    return (
        base.join(bonus, "host", "left")
        .crossJoin(F.broadcast(rem))
        .select(
            "host",
            "demand",
            (
                F.col("alloc0")
                + F.when(
                    F.col("j").isNotNull() & (F.col("j") <= F.col("r")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
            "capped",
        )
    )


# ------------------------------------------------------------------ q108
_KMV_K = 128  # sketch size (bottom-k distinct hashes)
_KMV_SPACE = 1 << 48  # 48-bit hash space (12 md5 hex digits)

_KMV_ORACLE = f"""
WITH a AS (SELECT DISTINCT 'u' || CAST(event_id % 8192 AS VARCHAR) AS url
           FROM events WHERE event_id % 3 <> 0),
b AS (SELECT DISTINCT 'u' || CAST(event_id % 8192 AS VARCHAR) AS url
      FROM events WHERE event_id % 2 <> 0),
ha AS (SELECT DISTINCT CAST('0x' || substr(md5(url), 1, 12) AS BIGINT) AS h FROM a),
hb AS (SELECT DISTINCT CAST('0x' || substr(md5(url), 1, 12) AS BIGINT) AS h FROM b),
ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) _
       ORDER BY h LIMIT {_KMV_K}),
tau AS (SELECT MAX(h) AS tau, CAST(COUNT(*) AS BIGINT) AS k_eff FROM ku),
rho AS (SELECT CAST(COUNT(*) AS BIGINT) AS rho
        FROM ku
        WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
exact AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                  FROM (SELECT url FROM a UNION SELECT url FROM b) _) AS exact_union,
                 (SELECT CAST(COUNT(*) AS BIGINT)
                  FROM (SELECT url FROM a INTERSECT SELECT url FROM b) _) AS exact_inter)
SELECT tau.k_eff,
       tau.tau,
       rho.rho,
       ((tau.k_eff - 1) * {_KMV_SPACE}) // tau.tau AS union_est,
       (rho.rho * (((tau.k_eff - 1) * {_KMV_SPACE}) // tau.tau)) // tau.k_eff
         AS inter_est,
       exact.exact_union,
       exact.exact_inter
FROM tau CROSS JOIN rho CROSS JOIN exact
"""


@query("q108_kmv_snapshot_overlap", oracle=_KMV_ORACLE)
def q108_kmv_snapshot_overlap(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) sketch overlap between two crawl
    snapshots (Bar-Yossef et al. 2002; Beyer et al. 2007 — public
    literature): keep the 128 smallest distinct 48-bit url hashes per
    snapshot, merge to the bottom-128 of the union, and estimate
    |A union B| = (k-1) * HASH_SPACE div tau (tau = the k-th minimum)
    and |A intersect B| = rho * union_est div k, where rho counts merged-
    sketch members present in BOTH input sketches. All-BIGINT (integer
    division; (k-1)*2^48 < 2^55 fits), md5-derived hashes, so both
    engines produce the identical sketch, tau, and estimates. The exact
    union/intersection columns exist ONLY for oracle certification of
    the estimator's inputs (the q101 pattern); production reads the two
    128-row sketches alone.

    Scale shape: answering "how much did this crawl overlap with last
    month's?" WITHOUT joining two 10^10-row url sets — each snapshot
    reduces to its bottom-128 via TakeOrderedAndProject (per-partition
    top-k, then a 128-row merge at the driver — the one collect-like
    step, and it is O(k) by construction); sketches are mergeable
    (bottom-k of unioned bottom-k's = bottom-k of the union, pinned by
    test), so per-partition partial sketches combine associatively
    exactly like q101's CMS cells. Reference analog: the reference
    decides re-scrape vs skip per item by existence checks
    (cloud_storage.py); sketch overlap prices whole-crawl dedup before
    any per-url work.
    """
    ev = t(spark, sf_dir, "events")
    url = F.concat(F.lit("u"), (F.col("event_id") % 8192).cast("string"))
    h = F.conv(F.substring(F.md5(F.col("url")), 1, 12), 16, 10).cast("long")
    # ONE scan + one groupBy: per distinct url, which snapshots saw it —
    # every downstream leg (both sketches AND the oracle-only exact
    # counts) reads this skinny staged frame instead of rescanning events
    urls = (
        ev.select(
            url.alias("url"),
            (F.col("event_id") % 3 != 0).alias("in_a"),
            (F.col("event_id") % 2 != 0).alias("in_b"),
        )
        .groupBy("url")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .select("in_a", "in_b", h.alias("h"))
        .localCheckpoint(eager=False)
    )
    ka = urls.filter("in_a").select("h").distinct().orderBy("h").limit(_KMV_K)
    kb = urls.filter("in_b").select("h").distinct().orderBy("h").limit(_KMV_K)
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(_KMV_K)
    tau1 = ku.agg(
        F.max("h").alias("tau"), F.count(F.lit(1)).alias("k_eff")
    )
    rho1 = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    exact = urls.agg(
        F.count_if(F.col("in_a") | F.col("in_b")).alias("exact_union"),
        F.count_if(F.col("in_a") & F.col("in_b")).alias("exact_inter"),
    )
    return (
        tau1.crossJoin(rho1)
        .crossJoin(F.broadcast(exact))
        .select(
            "k_eff",
            "tau",
            "rho",
            F.expr(f"((k_eff - 1) * {_KMV_SPACE}) div tau").alias("union_est"),
            F.expr(
                f"(rho * (((k_eff - 1) * {_KMV_SPACE}) div tau)) div k_eff"
            ).alias("inter_est"),
            "exact_union",
            "exact_inter",
        )
    )


# ------------------------------------------------------------------ q113
_RP_SHARDS = 8  # output shards -> 7 boundaries
_RP_BUCKETS = 256  # histogram buckets (top 8 bits of the 48-bit key)

_RP_ORACLE = f"""
WITH k AS (SELECT DISTINCT CAST('0x' || substr(md5('u' || CAST(event_id % 8192 AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
           FROM events),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM k),
b AS (SELECT UNNEST(range(1, {_RP_SHARDS})) AS i),
r AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM k)
SELECT CAST(b.i AS BIGINT) AS shard_boundary_idx,
       (CAST(b.i AS BIGINT) * n.total) // {_RP_SHARDS} AS k_rank,
       r.h AS boundary_hash,
       n.total AS n_keys
FROM b CROSS JOIN n
JOIN r ON r.rn = (CAST(b.i AS BIGINT) * n.total) // {_RP_SHARDS}
"""


@query("q113_range_partition_boundaries", oracle=_RP_ORACLE)
def q113_range_partition_boundaries(spark, sf_dir):
    """Equi-depth range-partition boundaries for balanced sorted output
    (what RangePartitioner computes by sampling — here EXACT, by the
    q102 distributed-selection machinery): the 7 order statistics at
    ranks i*n div 8 over the 48-bit url-hash domain, located via a
    256-bucket histogram (top 8 hash bits — map-side combined), bucket
    prefix sums, and a per-bucket row_number confined to the <=7 buckets
    that hold target ranks. Writing 100 TB of sorted output needs these
    boundaries FIRST; equal-depth shards are what keep the writers from
    straggling. No arithmetic on the keys (ordering + pick only);
    all-BIGINT rank math; ties impossible (hashes are distinct by
    construction of the distinct).

    Scale shape: one distinct (url-keyed shuffle), one histogram groupBy
    to 256 rows, windows over constant-sized tables, and a final
    row_number over only the boundary buckets (semi-joined, ~n/256 rows
    each). The full-sort alternative the oracle uses is the single-task
    collapse this query exists to avoid.
    """
    ev = t(spark, sf_dir, "events")
    url = F.concat(F.lit("u"), (F.col("event_id") % 8192).cast("string"))
    k = (
        ev.select(url.alias("url")).distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("url")), 1, 12), 16, 10)
            .cast("long")
            .alias("h")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n1 = k.agg(F.count(F.lit(1)).alias("total"))
    targets = n1.select(
        "total",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(1, _RP_SHARDS)])).alias(
            "i"
        ),
    ).select(
        F.col("i").alias("shard_boundary_idx"),
        "total",
        F.expr(f"(i * total) div {_RP_SHARDS}").alias("k_rank"),
    )
    bucket = (F.col("h") / (1 << 40)).cast("long")  # top 8 of 48 bits
    hist = k.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bucket", "cnt", F.sum("cnt").over(w_cum).alias("cum"))
    hit = (
        F.broadcast(targets)
        .join(cum, F.col("cum") >= F.col("k_rank"))
        .groupBy("shard_boundary_idx", "total", "k_rank")
        .agg(F.min("bucket").alias("bucket"))
        .join(cum.select("bucket", (F.col("cum") - F.col("cnt")).alias("below")), "bucket")
        .select(
            "shard_boundary_idx",
            "total",
            "k_rank",
            "bucket",
            (F.col("k_rank") - F.col("below")).alias("offset"),
        )
    )
    w_in = Window.partitionBy("bucket", "shard_boundary_idx").orderBy("h")
    picked = (
        k.withColumn("bucket", bucket)
        .join(F.broadcast(hit), "bucket")
        .withColumn("rn", F.row_number().over(w_in))
        .filter(F.col("rn") == F.col("offset"))
    )
    return picked.select(
        "shard_boundary_idx",
        "k_rank",
        F.col("h").alias("boundary_hash"),
        F.col("total").alias("n_keys"),
    )


# ------------------------------------------------------------------ q114
_DRIFT_HOSTS = 31  # synthetic host dial
_DRIFT_BUCKETS = 8  # response-size histogram buckets
_DRIFT_PERMILLE = 250  # flag hosts whose rounds differ by >= 25% L1/2

_DRIFT_ORACLE = f"""
WITH e AS (
  SELECT 'h' || CAST(user_id % {_DRIFT_HOSTS} AS VARCHAR) AS host,
         (event_id // 2) % {_DRIFT_BUCKETS} AS bucket,
         event_id % 2 AS round
  FROM events),
b AS (SELECT host, bucket,
             CAST(COUNT(*) FILTER (WHERE round = 0) AS BIGINT) AS ca,
             CAST(COUNT(*) FILTER (WHERE round = 1) AS BIGINT) AS cb
      FROM e GROUP BY host, bucket),
h AS (SELECT host, CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM b GROUP BY host)
SELECT b.host, h.na, h.nb,
       (500 * SUM(ABS(b.ca * h.nb - b.cb * h.na))) // (h.na * h.nb)
         AS drift_permille,
       (500 * SUM(ABS(b.ca * h.nb - b.cb * h.na))) // (h.na * h.nb)
         >= {_DRIFT_PERMILLE} AS is_drifted
FROM b JOIN h ON h.host = b.host
WHERE h.na > 0 AND h.nb > 0
GROUP BY b.host, h.na, h.nb
"""


@query("q114_host_content_drift", oracle=_DRIFT_ORACLE)
def q114_host_content_drift(spark, sf_dir):
    """Host content-drift detector: compare each host's response-size
    histogram across two crawl rounds by total-variation distance —
    drift = (1/2) * sum_b |cA(b)/NA - cB(b)/NB| — computed entirely in
    integers by cross-multiplying: 500 * sum|cA*NB - cB*NA| div (NA*NB)
    (permille). A host whose size distribution shifted >= 25% between
    rounds is flagged: the parked-domain / cloaking / template-redesign
    signal that tells the revisit scheduler (q82) to resample and the
    trap detector (q81) to look closer. Division-free comparison until
    the final integer div, so the score is bit-identical across engines.

    Scale shape: one map-side-combined groupBy to (host, bucket) cells —
    at most hosts x 8 rows regardless of fetch volume — then host-level
    totals and the drift fold, all shuffles on the host key of an
    already-tiny table. The histogram-per-host state is O(buckets),
    the same bounded-memory discipline as q101's sketch. Reference
    analog: the reference eyeballs per-source failure counters between
    runs (progress_monitor.py); this is that comparison made
    distributional and automatic.
    """
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % _DRIFT_HOSTS).cast("string")).alias(
            "host"
        ),
        (F.expr("event_id div 2") % _DRIFT_BUCKETS).alias("bucket"),
        (F.col("event_id") % 2).alias("round"),
    )
    b = e.groupBy("host", "bucket").agg(
        F.count_if(F.col("round") == 0).alias("ca"),
        F.count_if(F.col("round") == 1).alias("cb"),
    )
    h = b.groupBy("host").agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = b.join(h, "host").filter((F.col("na") > 0) & (F.col("nb") > 0))
    return (
        j.groupBy("host", "na", "nb")
        .agg(
            F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).alias(
                "l1x"
            )
        )
        .select(
            "host",
            "na",
            "nb",
            F.expr("(500 * l1x) div (na * nb)").alias("drift_permille"),
            (F.expr("(500 * l1x) div (na * nb)") >= _DRIFT_PERMILLE).alias(
                "is_drifted"
            ),
        )
    )


# ------------------------------------------------------------------ q149
_TREND_HOSTS = 40

_TREND_ORACLE = f"""
WITH f AS (SELECT user_id % {_TREND_HOSTS} AS host,
                  epoch_ms(ts) // 3600000 AS hr
           FROM events),
hb AS (SELECT host, hr, CAST(COUNT(*) AS BIGINT) AS c
       FROM f GROUP BY host, hr),
s AS (SELECT host,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(hr) AS BIGINT) AS sx,
             CAST(SUM(c) AS BIGINT) AS sy,
             CAST(SUM(hr * c) AS BIGINT) AS sxy
      FROM hb GROUP BY host)
SELECT host, n_buckets, total,
       n_buckets * sxy - sx * sy AS slope_num,
       CASE WHEN n_buckets * sxy - sx * sy > 0 THEN 'rising'
            WHEN n_buckets * sxy - sx * sy < 0 THEN 'falling'
            ELSE 'flat' END AS trend
FROM s
"""


@query("q149_host_traffic_trend", oracle=_TREND_ORACLE)
def q149_host_traffic_trend(spark, sf_dir):
    """Per-host fetch-traffic trend detection — the drift alarm a crawl
    operator puts next to q114's content drift and q147's fairness
    index: bucket each host's fetch log into hours and compute the
    EXACT least-squares slope NUMERATOR n·Σ(t·c) − Σt·Σc over
    (hour, count) points (Jain/q133 integer-moment idiom — the slope's
    SIGN and relative magnitude need no division, so the verdict is
    bit-identical everywhere; BIGINT-safe while hours·counts stay
    under ~10^9, i.e. any bounded reporting window). A rising trend on
    a politeness-capped host means queue growth (q127's starvation in
    time-series form); a falling one frees budget.

    Scale shape: one map-side-combined (host, hour) count — time
    bucketing collapses the log BEFORE the exchange — then a host-keyed
    rollup of five integers over O(hosts x hours) skinny rows.
    Reference semantic: the reference's last_active timestamp per
    scraper (parallel_scraper_manager.py:77-84) grown into an actual
    time series with a deterministic verdict."""
    ev = t(spark, sf_dir, "events")
    f = ev.select(
        (F.col("user_id") % _TREND_HOSTS).alias("host"),
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000").alias("hr"),
    )
    hb = f.groupBy("host", "hr").agg(F.count(F.lit(1)).alias("c"))
    s = hb.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("total"),
        F.sum("hr").cast("long").alias("sx"),
        F.sum("c").cast("long").alias("sy"),
        F.sum(F.col("hr") * F.col("c")).cast("long").alias("sxy"),
    )
    slope = F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "host",
        "n_buckets",
        "total",
        slope.alias("slope_num"),
        F.when(slope > 0, "rising")
        .when(slope < 0, "falling")
        .otherwise("flat")
        .alias("trend"),
    )


# ------------------------------------------------------------------ q152
_TIER_URLS = 200


@query(
    "q152_storage_tier_assignment",
    oracle=f"""
    WITH f AS (SELECT user_id % {_TIER_URLS} AS url_id, ts, event_id FROM events),
    h AS (SELECT MAX(ts) AS horizon FROM f),
    per AS (SELECT url_id,
                   CAST(COUNT(*) AS BIGINT) AS n_access,
                   MAX(ts) AS last_ts
            FROM f GROUP BY url_id),
    x AS (SELECT url_id, n_access,
                 CAST(date_diff('second', last_ts, h.horizon) AS BIGINT)
                   AS idle_s
          FROM per CROSS JOIN h)
    SELECT url_id, n_access, idle_s,
           CASE WHEN idle_s < 43200 AND n_access >= 50 THEN 'hot'
                WHEN idle_s < 172800 THEN 'warm'
                ELSE 'cold' END AS tier
    FROM x
    """,
)
def q152_storage_tier_assignment(spark, sf_dir):
    """Hot/warm/cold storage-tier assignment for archived captures —
    the lifecycle policy every web archive applies (recency + access
    frequency decide which payloads stay on fast storage and which move
    to cold object tiers — standard LRU/LFU-hybrid tiering, public
    storage practice): per URL, access count, idle seconds against the
    log horizon (exact integer epoch arithmetic), and the tier —
    'hot' (accessed within 12h AND frequently), 'warm' (within 48h),
    else 'cold'. Deterministic thresholds, no floats; the tier column
    is exactly what a `write.partitionBy("tier")` lifecycle job
    consumes next (the reference analog: processed/ vs failed/ dirs,
    enhanced_batch_processor.py:546-555, grown into a 3-tier policy).

    Scale shape: one map-side-combined url rollup (count + max ts) and
    a 1-row broadcast horizon — O(urls) state from any log volume; the
    assignment is a zero-shuffle projection after it. At archive scale
    this keys on the CDX partitioning (q91) so tier moves colocate
    with the index that must be rewritten when payloads move."""
    f = t(spark, sf_dir, "events").select(
        (F.col("user_id") % _TIER_URLS).alias("url_id"), "ts", "event_id"
    )
    h = f.agg(F.max("ts").alias("horizon"))
    per = f.groupBy("url_id").agg(
        F.count(F.lit(1)).alias("n_access"), F.max("ts").alias("last_ts")
    )
    x = per.crossJoin(F.broadcast(h)).select(
        "url_id",
        "n_access",
        (
            F.unix_timestamp(F.expr("cast(horizon as timestamp)"))
            - F.unix_timestamp(F.expr("cast(last_ts as timestamp)"))
        ).cast("long").alias("idle_s"),
    )
    return x.select(
        "url_id",
        "n_access",
        "idle_s",
        F.when((F.col("idle_s") < 43200) & (F.col("n_access") >= 50), "hot")
        .when(F.col("idle_s") < 172800, "warm")
        .otherwise("cold")
        .alias("tier"),
    )


# ---- q174: HyperLogLog URL-cardinality registers ------------------------
_HLL_M = 16  # registers (2^4); production uses 2^11-2^14 per host
_HLL_W = 20  # bits hashed into each register's leading-zero probe
_HLL_ALPHA = 0.673  # Flajolet et al. 2007 bias constant for m=16
_HLL_MOD = 256  # url_id = doc_id % MOD -> planted duplicate fetches


@query(
    "q174_hll_url_cardinality",
    oracle=f"""
    WITH d AS (
      SELECT lang, 'u:' || CAST(doc_id % {_HLL_MOD} AS VARCHAR) AS elem
      FROM documents),
    h AS (
      SELECT lang, elem,
             CAST('0x' || substr(md5(elem), 1, 8) AS BIGINT) % {_HLL_M} AS b,
             CAST('0x' || substr(md5(elem), 9, 5) AS BIGINT) AS v
      FROM d),
    reg AS (
      SELECT lang, b,
             MAX(CASE WHEN v = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W + 1} - length(bin(v)) END) AS rho
      FROM h GROUP BY lang, b),
    fold AS (
      SELECT lang,
             SUM(1.0 / CAST(1 << rho AS DOUBLE)) AS s_present,
             CAST(COUNT(*) AS BIGINT) AS n_present
      FROM reg GROUP BY lang),
    ex AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT elem) AS BIGINT) AS exact_distinct
      FROM d GROUP BY lang),
    est AS (
      SELECT lang, s_present + CAST({_HLL_M} - n_present AS DOUBLE) AS harmonic_sum,
             {_HLL_M} - n_present AS n_zero_registers
      FROM fold),
    fin AS (
      SELECT lang, harmonic_sum, CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
             {_HLL_ALPHA} * {_HLL_M * _HLL_M}.0 / harmonic_sum AS raw_estimate
      FROM est)
    SELECT f.lang, e.n_rows, e.exact_distinct, f.n_zero_registers,
           f.harmonic_sum, f.raw_estimate,
           CASE WHEN f.raw_estimate <= {2.5 * _HLL_M} AND f.n_zero_registers > 0
                THEN {_HLL_M}.0 * ln({_HLL_M}.0 / CAST(f.n_zero_registers AS DOUBLE))
                ELSE f.raw_estimate END AS estimate,
           CAST(floor(1000.0 * abs((CASE WHEN f.raw_estimate <= {2.5 * _HLL_M}
                                          AND f.n_zero_registers > 0
                THEN {_HLL_M}.0 * ln({_HLL_M}.0 / CAST(f.n_zero_registers AS DOUBLE))
                ELSE f.raw_estimate END) - CAST(e.exact_distinct AS DOUBLE))
                / CAST(e.exact_distinct AS DOUBLE)) AS BIGINT) AS err_permille
    FROM fin f JOIN ex e USING (lang)
    """,
)
def q174_hll_url_cardinality(spark, sf_dir):
    """HyperLogLog distinct-URL counting with PORTABLE registers (Flajolet
    et al. 2007) — the bounded-memory cardinality layer a 10^10-URL
    frontier monitors itself with. Spark's built-in approx_count_distinct
    (q19) emits an engine-private sketch; this query materializes the
    REGISTER TABLE itself (md5-derived bucket + leading-zero rank), so
    the sketch is an ordinary DataFrame any engine can merge (register
    merge = elementwise MAX — associative, idempotent), checkpoint to
    Iceberg, and union across crawl rounds without recounting. Per lang:
    the harmonic fold, the raw HLL estimate, the small-range
    linear-counting correction, and (fixture-only) the exact distinct
    count + permille error for the oracle to audit.

    Scale shape: ONE map-side-combined (group, bucket) MAX aggregate —
    state per group is m={_HLL_M} registers (production 2^11+) no matter
    how many URLs — then a per-group fold of <= m rows. The exact-count
    arm exists ONLY to audit the sketch at fixture scale; production
    keeps registers alone. Determinism: 2^-rho terms are dyadic (exact
    doubles, span < 53 bits -> order-independent exact SUM); the only
    transcendental is ln() on the tiny linear-counting arm, the one
    estimator small cardinalities require (same double operand both
    engines; q169's ln precedent)."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.concat(F.lit("u:"), (F.col("doc_id") % _HLL_MOD).cast("string")).alias(
            "elem"
        ),
    )
    h = d.select(
        "lang",
        "elem",
        (F.conv(F.substring(F.md5("elem"), 1, 8), 16, 10).cast("long") % _HLL_M)
        .alias("b"),
        F.conv(F.substring(F.md5("elem"), 9, 5), 16, 10).cast("long").alias("v"),
    )
    rho = F.when(F.col("v") == 0, F.lit(_HLL_W + 1)).otherwise(
        F.lit(_HLL_W + 1)
        - F.length(F.conv(F.col("v").cast("string"), 10, 2))
    )
    reg = h.groupBy("lang", "b").agg(F.max(rho).alias("rho"))
    fold = reg.groupBy("lang").agg(
        F.sum(F.expr("1.0 / cast(shiftleft(1, cast(rho as int)) as double)"))
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    ex = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("elem").alias("exact_distinct"),
    )
    hs = F.col("s_present") + (_HLL_M - F.col("n_present")).cast("double")
    zr = (F.lit(_HLL_M) - F.col("n_present")).cast("long")
    fin = fold.select(
        "lang",
        hs.alias("harmonic_sum"),
        zr.alias("n_zero_registers"),
        (F.lit(_HLL_ALPHA) * F.lit(float(_HLL_M * _HLL_M)) / hs).alias("raw_estimate"),
    )
    est = F.when(
        (F.col("raw_estimate") <= 2.5 * _HLL_M) & (F.col("n_zero_registers") > 0),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / F.col("n_zero_registers").cast("double")),
    ).otherwise(F.col("raw_estimate"))
    return fin.join(F.broadcast(ex), "lang").select(
        "lang",
        "n_rows",
        "exact_distinct",
        "n_zero_registers",
        "harmonic_sum",
        "raw_estimate",
        est.alias("estimate"),
        F.floor(
            1000.0
            * F.abs(est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        )
        .cast("long")
        .alias("err_permille"),
    )


# ---- q177: HDR-histogram latency quantile sketch -------------------------
_HDR_S = 3  # sub-bucket bits -> relative error bound 2^-s = 12.5%
_HDR_PCTS = (500, 900, 990)  # permille targets


@query(
    "q177_hdr_latency_sketch",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             GREATEST(CAST(floor(value * 1000) AS BIGINT) + 1, 1) AS v
      FROM events),
    ix AS (
      SELECT event_type, v,
             CASE WHEN length(bin(v)) - 1 < {_HDR_S} THEN v
                  ELSE (length(bin(v)) - 1 - {_HDR_S} + 1) * {1 << _HDR_S}
                       + ((v >> (length(bin(v)) - 1 - {_HDR_S})) - {1 << _HDR_S})
             END AS idx
      FROM v),
    b AS (SELECT event_type, idx, CAST(COUNT(*) AS BIGINT) AS c
          FROM ix GROUP BY event_type, idx),
    cw AS (SELECT event_type, idx, c,
                  SUM(c) OVER (PARTITION BY event_type ORDER BY idx) AS cum,
                  SUM(c) OVER (PARTITION BY event_type) AS n,
                  COUNT(*) OVER (PARTITION BY event_type) AS n_buckets,
                  CASE WHEN idx < {1 << _HDR_S} THEN idx
                       ELSE ({1 << _HDR_S} + idx % {1 << _HDR_S})
                            << (CAST(idx // {1 << _HDR_S} AS INT) - 1)
                  END AS lo
           FROM b)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(n_buckets) AS BIGINT) AS n_buckets,
           {", ".join(
               f"CAST(MIN(CASE WHEN cum >= ({p} * n + 999) // 1000 THEN lo END)"
               f" AS BIGINT) AS p{p}_micro"
               for p in _HDR_PCTS)}
    FROM cw GROUP BY event_type
    """,
)
def q177_hdr_latency_sketch(spark, sf_dir):
    """Mergeable quantile sketch over fetch latencies, HdrHistogram-style
    (Gil Tene's High Dynamic Range histogram; same bucketing family as
    DDSketch): each integer micro-latency lands in a bucket addressed by
    (exponent, {_HDR_S}-bit sub-bucket), so bucket width tracks magnitude
    and every estimate carries a GUARANTEED relative error <= 2^-{_HDR_S}
    = 12.5%. Completes the sketch suite next to q101 (CMS, frequency),
    q108 (KMV, overlap) and q174 (HLL, cardinality): quantiles. Unlike
    q102's exact distributed selection (a per-query scan), the HDR bucket
    table IS the state: counts are additive, so per-partition / per-round
    sketches merge by plain +, checkpoint to Iceberg, and answer any
    quantile later without touching raw latencies. Emits per event_type
    the bucket count and the P50/P90/P99 lower-bound estimates in integer
    micro-units — all-integer bucketing (the _FL2 floor-log2 bin() idiom,
    shifts, divs), zero transcendentals, bit-identical cross-engine.

    Scale shape: ONE map-side-combined (group, bucket) count — state per
    group is <= (64 - {_HDR_S}) * {1 << _HDR_S} buckets no matter how many
    events — then the cumulative walk windows over that tiny bucket table
    (bounded partitions, never the event stream). The exact-percentile
    audit lives in the pytest, not the plan: production keeps buckets
    only."""
    m = 1 << _HDR_S
    v = F.greatest(
        F.floor(F.col("value") * 1000).cast("long") + 1, F.lit(1).cast("long")
    )
    ix = t(spark, sf_dir, "events").select(
        "event_type", v.alias("v")
    ).withColumn(
        "e", F.length(F.conv(F.col("v").cast("string"), 10, 2)) - 1
    ).withColumn(
        "idx",
        F.when(F.col("e") < _HDR_S, F.col("v")).otherwise(
            (F.col("e") - _HDR_S + 1) * m
            + F.expr(f"shiftright(v, cast(e - {_HDR_S} as int))")
            - m
        ),
    )
    b = ix.groupBy("event_type", "idx").agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("idx")
    wa = Window.partitionBy("event_type")
    lo = F.when(F.col("idx") < m, F.col("idx")).otherwise(
        F.expr(
            f"shiftleft({m} + idx % {m}, cast(idx div {m} as int) - 1)"
        )
    )
    cw = b.select(
        "event_type",
        "idx",
        "c",
        F.sum("c").over(wo).alias("cum"),
        F.sum("c").over(wa).alias("n"),
        F.count(F.lit(1)).over(wa).alias("n_buckets"),
        lo.alias("lo"),
    )
    return cw.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("n_buckets").cast("long").alias("n_buckets"),
        *[
            F.min(
                # integer ceil-rank: (p*n + 999) div 1000, same as the
                # oracle's `//` (a double `/` here can land strictly above
                # the integer rank and silently shift one bucket)
                F.when(
                    F.col("cum") >= F.expr(f"({p} * n + 999) div 1000"),
                    F.col("lo"),
                )
            )
            .cast("long")
            .alias(f"p{p}_micro")
            for p in _HDR_PCTS
        ],
    )


# ------------------------------------------------------------------ q190
_TD_HOSTS = 40  # corpus host-id space dial
_TD_PATHS = 201  # corpus path-key space
# Takedown / opt-out request list: (host, path_prefix) — NULL prefix
# means the WHOLE host opted out (robots retroactive, registrar-level
# DMCA); a prefix scopes the purge to one URL family. A true small
# dimension (10^2-10^5 rows in production), broadcast by construction.
_TD_PATTERNS = (
    ("h7", None),
    ("h13", None),
    ("h21", None),
    ("h3", "/p1"),
    ("h5", "/p4"),
    ("h11", "/p9"),
    ("h11", "/p19"),
    ("h30", "/p2"),
)

_TD_PATTERNS_SQL = ", ".join(
    f"('{h}', " + ("NULL" if p is None else f"'{p}'") + ")"
    for h, p in _TD_PATTERNS
)

_TD_ORACLE = f"""
WITH c AS (
  SELECT 'h' || CAST(event_id % {_TD_HOSTS} AS VARCHAR) AS host,
         'h' || CAST(event_id % {_TD_HOSTS} AS VARCHAR)
             || '/p' || CAST(event_id % {_TD_PATHS} AS VARCHAR) AS url,
         100 + event_id % 900 AS n_bytes
  FROM events),
pat AS (SELECT * FROM (VALUES {_TD_PATTERNS_SQL}) AS v(p_host, p_prefix)),
m AS (SELECT pat.p_host, pat.p_prefix, c.url, c.n_bytes
      FROM c JOIN pat ON c.host = pat.p_host
      WHERE pat.p_prefix IS NULL
         OR starts_with(c.url, pat.p_host || pat.p_prefix))
SELECT p_host,
       COALESCE(p_prefix, '<entire host>') AS p_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_fetches_purged,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls_purged,
       CAST(SUM(n_bytes) AS BIGINT) AS bytes_purged
FROM m GROUP BY p_host, p_prefix
"""


@query("q190_takedown_compliance", oracle=_TD_ORACLE)
def q190_takedown_compliance(spark, sf_dir):
    """Takedown / opt-out purge audit — the corpus-governance pass every
    crawl-derived training set runs before release (robots retroactive
    opt-outs, DMCA notices, GDPR erasure: the request list arrives as
    (host, optional path prefix) rules; publishers' ai.txt / CCBot
    opt-out semantics are host-or-prefix scoped the same way). For each
    rule: how many fetch records, distinct URLs, and bytes it purges —
    the per-request accounting a compliance report ships, and the dry
    run that sizes the purge before the destructive anti-join rewrites
    the corpus (the actual removal is this match inverted: the same
    plan shape as q06/q38's seen anti-join).

    Scale shape: the request list is a TRUE small dimension (10^2-10^5
    rows) — the match is one BROADCAST equi-join on host (never a
    corpus shuffle, never a LIKE cross-join: the host key prunes first,
    the prefix test runs only inside a host's matched rows as a codegen
    starts_with on the joined pair), then one (rule)-keyed rollup over
    match rows only. A 10^10-URL corpus pays a map-side broadcast probe
    + an exchange of just the purged slice. Whole-host rules and
    prefix rules ride the same join. Reference semantic: the reference
    honors upstream removal by source allow-lists at FETCH time
    (per-source scrapers); a retained corpus must honor them
    RETROACTIVELY — this is that ledger.
    """
    hid = F.col("event_id") % _TD_HOSTS
    host = F.concat(F.lit("h"), hid.cast("string"))
    c = t(spark, sf_dir, "events").select(
        host.alias("host"),
        F.concat(
            host, F.lit("/p"), (F.col("event_id") % _TD_PATHS).cast("string")
        ).alias("url"),
        (100 + F.col("event_id") % 900).cast("long").alias("n_bytes"),
    )
    pat = spark.createDataFrame(
        [(h, p) for h, p in _TD_PATTERNS], "p_host string, p_prefix string"
    )
    m = c.join(F.broadcast(pat), c.host == pat.p_host).filter(
        F.col("p_prefix").isNull()
        | F.col("url").startswith(F.concat(F.col("p_host"), F.col("p_prefix")))
    )
    return m.groupBy("p_host", "p_prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches_purged"),
        F.countDistinct("url").cast("long").alias("n_urls_purged"),
        F.sum("n_bytes").cast("long").alias("bytes_purged"),
    ).select(
        "p_host",
        F.coalesce("p_prefix", F.lit("<entire host>")).alias("p_prefix"),
        "n_fetches_purged",
        "n_urls_purged",
        "bytes_purged",
    )


# ------------------------------------------------------------------ q193
_SKEW_PARTS = 32  # target partition count for the audit
_SKEW_HOSTS = 97  # non-mega host-id space
_SKEW_SALTS = 16  # salt fan-out for the salted strategy
_SKEW_MEGA_MOD = 5  # event_id % 5 < 2 -> mega-host (40% of traffic)
# Knuth multiplicative constant (public). Bound honesty: the url_hash arm
# computes event_id * MULT in BIGINT, exact while event_id < ~3.47e9
# (2^63 / MULT); past that Spark (non-ANSI) wraps where DuckDB raises, so
# the closed form holds only under that event_id bound — mask first
# ((event_id % 2^31) * MULT % 2^31) to run the audit beyond it.
_SKEW_MULT = 2654435761

_SKEW_ORACLE = f"""
WITH u AS (
  SELECT event_id,
         CASE WHEN event_id % {_SKEW_MEGA_MOD} < 2 THEN 0
              ELSE event_id % {_SKEW_HOSTS} END AS hid
  FROM events),
x AS (
  SELECT 'host' AS strategy, hid % {_SKEW_PARTS} AS part FROM u
  UNION ALL
  SELECT 'host_salted',
         (hid * {_SKEW_SALTS} + event_id % {_SKEW_SALTS}) % {_SKEW_PARTS}
  FROM u
  UNION ALL
  SELECT 'url_hash', ((event_id * {_SKEW_MULT}) % 2147483648) % {_SKEW_PARTS}
  FROM u),
loads AS (SELECT strategy, part, CAST(COUNT(*) AS BIGINT) AS load
          FROM x GROUP BY strategy, part)
SELECT strategy,
       CAST(COUNT(*) AS BIGINT) AS n_parts_used,
       CAST(SUM(load) AS BIGINT) AS total_rows,
       CAST(MAX(load) AS BIGINT) AS max_load,
       (1000 * MAX(load) * {_SKEW_PARTS}) // SUM(load) AS imbalance_permille,
       (1000 * MAX(load) * {_SKEW_PARTS}) // SUM(load) > 2000 AS is_skewed
FROM loads GROUP BY strategy
"""


@query("q193_partition_skew_audit", oracle=_SKEW_ORACLE)
def q193_partition_skew_audit(spark, sf_dir):
    """Partition-skew audit — the shuffle-layout diagnosis behind the
    frontier's salting decision (operators/frontier.py's host-hash
    salting; q44's salted join): given the candidate partitioning keys
    a crawl actually chooses between, measure the load each would put
    on the hottest of {parts} partitions. The fixture plants a
    mega-host carrying 40% of traffic (the straggler-maker: one
    reducer does 13x the average work under naive host keying) and
    audits three strategies — 'host' (politeness-aligned, skewed),
    'host_salted' (host x {salts} salts — the q44/P3 remedy: bounded
    fan-out, straggler dissolved), 'url_hash' (multiplicative hash —
    uniform, but politeness-blind: a fetch scheduler cannot use it
    alone). Per strategy: partitions used, rows, max single-partition
    load, imbalance permille (1000 = perfectly level; the straggler
    multiplier x1000), and the >2x flag that triggers salting. This is
    the MEASUREMENT the SCALE.md salting math anchors to; AQE's skew
    split handles joins, but a stateful frontier must pick its
    LAYOUT key before writing, hence the explicit audit.

    Scale shape: one pass — the 3-way strategy fan-out explodes only
    (event_id, hid) skinny pairs; per-(strategy, partition) counts
    map-side combine into at most 3 x {parts} groups; the final rollup
    is 96 rows. At 10^10 URLs this is the cheapest query in the
    registry — and the one that decides the cost of every other
    shuffle. All BIGINT closed-form arithmetic (Knuth multiplicative
    hashing — public constant — for the url_hash arm, so both engines
    agree bit-for-bit without a shared xxhash). Reference semantic:
    none — a single-process scraper has no partitions; a cluster
    frontier lives or dies by this table.
    """
    hid = F.when(F.col("event_id") % _SKEW_MEGA_MOD < 2, 0).otherwise(
        F.col("event_id") % _SKEW_HOSTS
    )
    u = t(spark, sf_dir, "events").select(
        F.col("event_id"), hid.cast("long").alias("hid")
    )
    x = u.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("host").alias("strategy"),
                    (F.col("hid") % _SKEW_PARTS).alias("part"),
                ),
                F.struct(
                    F.lit("host_salted").alias("strategy"),
                    (
                        (F.col("hid") * _SKEW_SALTS + F.col("event_id") % _SKEW_SALTS)
                        % _SKEW_PARTS
                    ).alias("part"),
                ),
                F.struct(
                    F.lit("url_hash").alias("strategy"),
                    F.expr(
                        f"((event_id * {_SKEW_MULT}) % 2147483648) % {_SKEW_PARTS}"
                    ).alias("part"),
                ),
            )
        ).alias("sp")
    ).select(F.col("sp.strategy").alias("strategy"), F.col("sp.part").alias("part"))
    loads = x.groupBy("strategy", "part").agg(
        F.count(F.lit(1)).cast("long").alias("load")
    )
    imb = F.expr(f"(1000 * max(load) * {_SKEW_PARTS}) div sum(load)")
    return loads.groupBy("strategy").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts_used"),
        F.sum("load").cast("long").alias("total_rows"),
        F.max("load").cast("long").alias("max_load"),
        imb.alias("imbalance_permille"),
        (imb > 2000).alias("is_skewed"),
    )


q193_partition_skew_audit.__doc__ = q193_partition_skew_audit.__doc__.replace(
    "{parts}", str(_SKEW_PARTS)
).replace("{salts}", str(_SKEW_SALTS))


# ------------------------------------------------------------------ q199
_DIV_CONC_TOP = 500  # top-source share above this permille -> concentrated

_DIV_ORACLE = f"""
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY lang, source),
per AS (SELECT lang,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_sources,
               CAST(SUM(n * n) AS BIGINT) AS sq,
               MIN(CASE WHEN (n, source) = (
                     SELECT (n2.n, n2.source) FROM c n2
                     WHERE n2.lang = c.lang
                     ORDER BY n2.n DESC, n2.source DESC LIMIT 1)
                   THEN source END) AS top_source,
               CAST(MAX(n) AS BIGINT) AS top_n
        FROM c GROUP BY lang),
a AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n FROM c GROUP BY source),
allr AS (SELECT '<all>' AS lang,
                CAST(SUM(n) AS BIGINT) AS n_docs,
                CAST(COUNT(*) AS BIGINT) AS n_sources,
                CAST(SUM(n * n) AS BIGINT) AS sq,
                MIN(CASE WHEN (n, source) = (
                      SELECT (a2.n, a2.source) FROM a a2
                      ORDER BY a2.n DESC, a2.source DESC LIMIT 1)
                    THEN source END) AS top_source,
                CAST(MAX(n) AS BIGINT) AS top_n
         FROM a),
u AS (SELECT * FROM per UNION ALL SELECT * FROM allr)
SELECT lang, n_docs, n_sources, top_source,
       (1000 * top_n) // n_docs AS top_share_permille,
       (1000000 * sq) // (n_docs * n_docs) AS simpson_ppm,
       (1000 * n_docs * n_docs) // sq AS effective_sources_milli,
       ((1000 * top_n) // n_docs > {_DIV_CONC_TOP}
        OR 50 * ((1000 * n_docs * n_docs) // sq) < 41 * 1000 * n_sources)
         AS concentrated
FROM u
"""


@query("q199_source_diversity", oracle=_DIV_ORACLE)
def q199_source_diversity(spark, sf_dir):
    """Source-diversity report — Simpson concentration and effective
    source count (Simpson 1949; the Herfindahl-Hirschman index of
    antitrust economics — both public literature): a training corpus
    dominated by one source inherits that source's biases and single
    point of failure no matter how many sources NOMINALLY contribute.
    Per language and for the whole corpus: docs, contributing sources,
    the top source and its share, Simpson concentration in ppm
    (sum of squared shares — 1/n_sources when perfectly level, 1.0
    when monopolized), the EFFECTIVE source count 1/Simpson in milli
    (the "how many sources is this really" number a mix report leads
    with, next to q71's temperature weights and q167's sample audit),
    and the concentration flag (top share > {top} permille, or
    effective sources below 82% of the nominal count — the fixture's
    fr slice trips it at both test scales; the level corpus row never
    does). All-integer:
    Simpson's squared shares keep a common denominator n_docs^2, so
    ppm and the 1/Simpson reciprocal are exact integer divisions.

    Scale shape: one (lang, source) census — the only corpus-sized
    exchange, map-side combined — then per-language rollups of the
    SQUARED census counts (sum-of-squares rides the same aggregate;
    the top source is a struct-max argmax — ties break to the
    lexicographically LAST source in both engines — no window); the corpus-wide
    row reuses the census through a source-keyed re-aggregate. At
    10^5 sources x 10^2 languages the census is broadcast-sized.
    Reference semantic: the reference fixes its source mix by config
    quota (/root/reference/config.py) — the mix IS the config; a
    crawl-scale corpus must MEASURE what the mix turned out to be.
    """
    c = (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=False)  # read by per-lang AND corpus rollups
    )

    def rollup(df, lang_col):
        top = F.max(F.struct(F.col("n"), F.col("source"))).alias("top")
        return df.groupBy(lang_col.alias("lang")).agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sq"),
            top,
        )

    # corpus-wide: collapse to per-source totals first (a source can span
    # languages), then the same rollup shape
    a = c.groupBy("source").agg(F.sum("n").cast("long").alias("n"))
    u = rollup(c, F.col("lang")).unionByName(rollup(a, F.lit("<all>")))
    top_share = F.expr("(1000 * top.n) div n_docs")
    eff = F.expr("(1000 * n_docs * n_docs) div sq")
    return u.select(
        "lang",
        "n_docs",
        "n_sources",
        F.col("top.source").alias("top_source"),
        top_share.alias("top_share_permille"),
        F.expr("(1000000 * sq) div (n_docs * n_docs)").alias("simpson_ppm"),
        eff.alias("effective_sources_milli"),
        (
            (top_share > _DIV_CONC_TOP) | (50 * eff < 41000 * F.col("n_sources"))
        ).alias("concentrated"),
    )


q199_source_diversity.__doc__ = q199_source_diversity.__doc__.replace(
    "{top}", str(_DIV_CONC_TOP)
)
