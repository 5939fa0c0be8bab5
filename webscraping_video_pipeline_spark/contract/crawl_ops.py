"""Engine-core operators (SURVEY.md §2.9 C1/C2/P1-P3 + §2.10) expressed on
the driver's testdata so they are DuckDB-oracle-checked: a synthetic frontier
is derived deterministically from ``documents`` (urls from doc_id/source),
then canonicalized, deduped, politeness-scheduled, budgeted, and
circuit-breakered exactly as the crawl engine does on ``pages``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

# Messy-URL derivation shared by Spark and SQL: host from source, path from
# doc_id; every 3rd url uppercases the host, every 5th appends a fragment,
# every 7th appends a lone '?'.
_URLS_SQL = """
    SELECT doc_id,
           'https://' ||
           (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END) ||
           '.example.com/d/' || CAST(doc_id AS VARCHAR) || '.html' ||
           (CASE WHEN doc_id % 7 = 0 THEN '?' ELSE '' END) ||
           (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url,
           lower(source) || '.example.com' AS host,
           1.0 / (1 + doc_id % 997) AS priority
    FROM documents
"""


def _urls(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 3 == 0, F.upper(F.col("source"))).otherwise(
                F.col("source")
            ),
            F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(".html"),
            F.when(F.col("doc_id") % 7 == 0, "?").otherwise(""),
            F.when(F.col("doc_id") % 5 == 0, "#frag").otherwise(""),
        ).alias("url"),
        F.concat(F.lower(F.col("source")), F.lit(".example.com")).alias("host"),
        (1.0 / (1 + F.col("doc_id") % 997)).alias("priority"),
    )


# -------------------------------------------------------------------- C1
@query(
    "q37_url_canonicalize",
    oracle=f"""
    WITH u AS ({_URLS_SQL})
    SELECT doc_id, url,
           'https://' || lower(regexp_extract(url, '^https://([^/]+)/', 1)) || '/' ||
           regexp_replace(regexp_extract(url, '^https://[^/]+/(.*)$', 1), '(#.*$|\\?$)', '')
             AS canon_url
    FROM u
    """,
)
def q37_url_canonicalize(spark, sf_dir):
    """C1 canonicalization semantics, SQL-expressible subset (lowercase
    host, strip fragment and lone '?'), oracle-checked; the full UDF path
    (IDNA, param sorting) is golden-tested in tests/test_urls.py."""
    u = _urls(spark, sf_dir)
    host = F.lower(F.regexp_extract(F.col("url"), r"^https://([^/]+)/", 1))
    path = F.regexp_replace(
        F.regexp_extract(F.col("url"), r"^https://[^/]+/(.*)$", 1), r"(#.*$|\?$)", ""
    )
    return u.select(
        "doc_id",
        "url",
        F.concat(F.lit("https://"), host, F.lit("/"), path).alias("canon_url"),
    )


# -------------------------------------------------------------------- J2/U2
@query(
    "q38_seen_antijoin_rounds",
    oracle=f"""
    WITH u AS ({_URLS_SQL}),
    seen_r1 AS (SELECT doc_id FROM u WHERE doc_id % 2 = 0),
    new_r2 AS (SELECT u.* FROM u WHERE NOT EXISTS
               (SELECT 1 FROM seen_r1 s WHERE s.doc_id = u.doc_id))
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM new_r2 GROUP BY host
    """,
)
def q38_seen_antijoin_rounds(spark, sf_dir):
    """J2/U2: round-2 candidates anti-joined against the round-1 seen set
    (enhanced_batch_processor.py:515-519,533)."""
    u = _urls(spark, sf_dir)
    seen = u.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    return (
        u.join(seen, "doc_id", "left_anti")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_new"), F.min("doc_id").alias("first_doc"))
    )


# -------------------------------------------------------------------- P1
@query(
    "q36_politeness_slots",
    oracle=f"""
    WITH u AS ({_URLS_SQL}),
    ranked AS (
      SELECT host, doc_id, priority,
             ROW_NUMBER() OVER (PARTITION BY host
                                ORDER BY priority DESC, doc_id ASC) - 1 AS slot
      FROM u)
    SELECT host, doc_id, slot,
           CAST(slot AS DOUBLE) * 2.0 AS offset_s
    FROM ranked WHERE slot < 4
    """,
)
def q36_politeness_slots(spark, sf_dir):
    """P1: deterministic token-bucket fetch slots — rank per host by
    (priority desc, id asc), admit capacity=4, slot offset = slot *
    crawl_delay (2.0s here). The computed analog of the reference's
    per-source sleeps (config.py:15-72)."""
    u = _urls(spark, sf_dir)
    w = Window.partitionBy("host").orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    return (
        u.withColumn("slot", F.row_number().over(w) - 1)
        .filter(F.col("slot") < 4)
        .select(
            "host",
            "doc_id",
            "slot",
            (F.col("slot").cast("double") * 2.0).alias("offset_s"),
        )
    )


# -------------------------------------------------------------------- L2
_Q35_BUDGET = 2000000


@query(
    "q35_global_budget_prefix",
    oracle="""
    SELECT o_orderkey, running FROM (
      SELECT o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
                  OVER (ORDER BY o_orderdate ASC, o_orderkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      FROM orders)
    WHERE running <= 2000000
    """,
)
def q35_global_budget_prefix(spark, sf_dir):
    """L2 global greedy budget prefix (enhanced_batch_processor.py:405-429),
    computed WITHOUT the single-task global running-sum window the oracle
    uses: values are non-negative, so running is non-decreasing along the
    order and only the shards whose EXCLUSIVE offset is still under the
    budget can contribute rows — the two-level prefix-sum discipline
    (ordinals.py) plus budget pruning:

    1. shard = orderdate div 32 days (monotone along the sort order);
    2. per-shard decimal sums reduce map-side (one skinny exchange);
    3. exclusive shard offsets via the broadcast non-equi self-join
       (|shards|² pairs, no unpartitioned window anywhere);
    4. shards with offset > budget are PRUNED before any row-level work —
       at 10^10 orders the surviving prefix is a handful of shards, and
       the rest of the corpus is never sorted at all;
    5. the within-shard running sum rides a window PARTITIONED by shard.

    Bit-equality with the oracle's DECIMAL(38,10) window: decimal addition
    is exact, hence reassociation-safe. The pruning also keeps every
    operand narrow — qualifying offsets are budget-bounded (7 integer
    digits) and shard subtotals fit decimal(28,10) — so offset + run stays
    decimal(29,10), under Spark's precision-38 ceiling where `Add` would
    otherwise drop the 10th fractional digit (allowPrecisionLoss).
    Precondition: value >= 0 (order totals; enforced nowhere cheaper than
    the synth contract)."""
    o = t(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,10)").alias("v"),
        F.expr("datediff(o_orderdate, date'1992-01-01') div 32").alias("_shard"),
    ).localCheckpoint(eager=False)
    tot = d.groupBy("_shard").agg(F.sum("v").alias("_s"))  # decimal(28,10)
    lo = tot.select(F.col("_shard").alias("_lo"), F.col("_s").alias("_losum"))
    qual = (
        tot.join(F.broadcast(lo), F.col("_lo") < F.col("_shard"), "left")
        .groupBy("_shard")
        .agg(F.coalesce(F.sum("_losum"), F.lit(0)).alias("_off0"))
        .filter(F.col("_off0") <= _Q35_BUDGET)  # budget-prune whole shards
        .select("_shard", F.col("_off0").cast("decimal(28,10)").alias("_off"))
    )
    w_in = Window.partitionBy("_shard").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.join(F.broadcast(qual), "_shard")
        .withColumn("running", (F.col("_off") + F.sum("v").over(w_in)).cast("double"))
        .filter(F.col("running") <= _Q35_BUDGET)
        .select("o_orderkey", "running")
    )


# ------------------------------------------------------------ §2.10 breaker
@query(
    "q39_circuit_breaker",
    oracle="""
    WITH errs AS (
      SELECT user_id % 20 AS host_id, CAST(COUNT(*) AS BIGINT) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY user_id % 20)
    SELECT host_id, n_errors,
           CASE WHEN n_errors >= 100 THEN TRUE ELSE FALSE END AS tripped
    FROM errs
    """,
)
def q39_circuit_breaker(spark, sf_dir):
    """Error circuit breaker: hosts with too many consecutive errors are
    removed from the next round (parallel_scraper_manager.py:171-178,
    3-strike rule; threshold scaled to the fixture's volume)."""
    e = t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "error")
        .groupBy((F.col("user_id") % 20).alias("host_id"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .withColumn("tripped", F.col("n_errors") >= 100)
    )


# ------------------------------------------------------------ §2.10 retry
@query(
    "q40_retry_backoff",
    oracle="""
    SELECT attempts,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(2.0 * (CASE attempts WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)) AS DOUBLE)
             AS total_delay_s
    FROM (SELECT CAST(event_id % 3 AS INTEGER) AS attempts
          FROM events WHERE event_type = 'error')
    GROUP BY attempts
    """,
)
def q40_retry_backoff(spark, sf_dir):
    """Exponential-backoff retry delays (cloud_storage.py:159-208: delay =
    retry_delay * 2**attempt) computed, never slept."""
    e = t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "error")
        .select((F.col("event_id") % 3).cast("int").alias("attempts"))
        .groupBy("attempts")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.lit(2.0)
                * F.when(F.col("attempts") == 0, 1)
                .when(F.col("attempts") == 1, 2)
                .otherwise(4)
            ).alias("total_delay_s"),
        )
    )


# -------------------------------------------------------------- J5 salted
@query(
    "q44_salted_skew_join",
    oracle="""
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
    FROM events e JOIN documents d ON d.doc_id = e.user_id % 500
    GROUP BY d.lang
    """,
)
def q44_salted_skew_join(spark, sf_dir):
    """J5 skew handling: the fact side is salted (xxhash64 % 8 appended to
    the key), the dim side exploded over the 8 salts — result identical to
    the plain join (the oracle computes the plain join). Deterministic
    salting per SURVEY §4; AQE skew-join is the runtime backstop."""
    e = t(spark, sf_dir, "events")
    d = t(spark, sf_dir, "documents")
    n_salt = 8
    fact = e.withColumns(
        {
            "join_key": F.col("user_id") % 500,
            "salt": F.pmod(F.xxhash64("event_id"), F.lit(n_salt)),
        }
    )
    dim = d.select("doc_id", "lang").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        fact.join(
            dim,
            (fact.join_key == dim.doc_id) & (fact.salt == dim.salt),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("total_value"),
        )
    )


# ------------------------------------------------------------ snapshot CDC
@query(
    "q86_snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0),
    snap_b AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS fp
      FROM documents WHERE doc_id % 5 <> 0)
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           CASE WHEN a.doc_id IS NULL THEN 'added'
                WHEN b.doc_id IS NULL THEN 'removed'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
    """,
)
def q86_snapshot_diff(spark, sf_dir):
    """Crawl-snapshot CDC: classify every URL across two consecutive crawl
    rounds as added / removed / changed / unchanged — the diff an
    incremental corpus build consumes instead of reprocessing the full
    snapshot (changed+added flow into the dedup/quality pipeline, removed
    tombstones the index). Snapshots derive deterministically from
    ``documents``: round A misses doc_id%7==0 (not yet discovered), round
    B misses doc_id%5==0 (dropped) and rewrites text for doc_id%3==0;
    "changed" compares md5 content fingerprints, never full text.

    Scale shape: ONE full-outer sort-merge join on the url/doc key — both
    snapshots are already partitioned by that key in the catalog layout,
    so at 10^10 URLs the join co-locates without a fresh exchange
    (bucketed tables; tests/test_bucketed_join.py pins the
    exchange-free pattern), and the comparison ships only (key, 16-byte
    fingerprint) — the full-outer join is the one join type the crawl
    core never needed until snapshots met.

    Reference semantic: the reference re-scrapes and OVERWRITES per run
    (enhanced_batch_processor.py:740-764 resume; cloud_storage.py
    existence checks); a web-scale pipeline diffs snapshots instead."""
    d = t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5("text").alias("fp_a")
    )
    b = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("fp_b"),
    )
    j = a.join(b, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp_a").isNull(), "added")
        .when(F.col("fp_b").isNull(), "removed")
        .when(F.col("fp_a") != F.col("fp_b"), "changed")
        .otherwise("unchanged")
    )
    return j.select("doc_id", status.alias("status"))


# --------------------------------------------------- registrable domains
# Public-suffix list slice (deterministic config — the real PSL is ~9k
# rules and ships as a config table; the longest-match semantics below
# are the real algorithm). Includes the bare ccTLDs so longest-match is
# load-bearing: 'x.co.uk' must resolve to suffix 'co.uk', not 'uk'.
PSL = [
    "com", "org", "net", "io", "au", "uk",
    "co.uk", "ac.uk", "github.io", "com.au",
]
_SFX_BY_MOD = ["com", "org", "net", "co.uk", "ac.uk", "github.io", "com.au"]

_HOSTS92_SQL = (
    """
    SELECT doc_id,
           (CASE WHEN doc_id % 4 = 0 THEN '' ELSE 's' || CAST(doc_id % 3 AS VARCHAR) || '.' END)
           || 'd' || CAST(doc_id % 11 AS VARCHAR) || '.' ||
           (CASE doc_id % 7 """
    + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_SFX_BY_MOD))
    + """ END) AS host
    FROM documents
"""
)

_PSL_SQL = ", ".join(f"'{s}'" for s in PSL)


@query(
    "q92_registrable_domain_rollup",
    oracle=f"""
    WITH h AS ({_HOSTS92_SQL}),
    lab AS (SELECT doc_id, host, string_split(host, '.') AS ls FROM h),
    m AS (SELECT doc_id, host,
                 CASE WHEN ls[len(ls)-1] || '.' || ls[len(ls)] IN ({_PSL_SQL})
                      THEN ls[len(ls)-1] || '.' || ls[len(ls)]
                      WHEN ls[len(ls)] IN ({_PSL_SQL}) THEN ls[len(ls)]
                 END AS sfx, ls
          FROM lab),
    r AS (SELECT doc_id, host, sfx,
                 ls[len(ls) - len(string_split(sfx, '.'))] || '.' || sfx AS reg_domain
          FROM m)
    SELECT reg_domain, sfx AS public_suffix,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(COUNT(*) AS BIGINT) AS n_urls
    FROM r GROUP BY reg_domain, sfx
    """,
)
def q92_registrable_domain_rollup(spark, sf_dir):
    """Registrable-domain rollup via public-suffix longest match: crawl
    politeness and budgets apply per REGISTRABLE domain (one label +
    public suffix), not per host — 'a.blog.co.uk' and 'b.blog.co.uk'
    share one budget, while 'x.github.io' and 'y.github.io' are
    DIFFERENT registrants (github.io is a public suffix). Hosts derive
    deterministically from doc_id (subdomain x domain x suffix mix);
    each host's suffix is the LONGEST match against the PSL table
    (bare 'uk' present so 'co.uk' must out-match it), the registrable
    domain is the label left of the suffix, and the rollup counts
    hosts/urls per registrant.

    Scale shape: the PSL is a config-sized table — both candidate
    matches (last-2-labels, last-1-label) are BROADCAST left joins, so
    suffix resolution is a zero-exchange projection over the corpus;
    the registrant rollup is the only corpus exchange (map-side
    combined, and it is the SAME host-family key the politeness
    scheduler (operators/politeness.py) partitions by, so the frontier
    reuses this exchange). Reference: per-source rate limits hard-coded
    at config.py:15-72 — per-registrant budgets are the open-web form."""
    d = t(spark, sf_dir, "documents")
    sfx_pick = F.element_at(
        F.array(*[F.lit(s) for s in _SFX_BY_MOD]), (F.col("doc_id") % 7 + 1).cast("int")
    )
    host = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"), F.lit("."))
        ),
        F.lit("d"),
        (F.col("doc_id") % 11).cast("string"),
        F.lit("."),
        sfx_pick,
    )
    ls = F.split(F.col("host"), "\\.")
    lab = d.select("doc_id", host.alias("host")).select(
        "doc_id",
        "host",
        F.element_at(ls, -1).alias("last1"),
        F.concat(F.element_at(ls, -2), F.lit("."), F.element_at(ls, -1)).alias("last2"),
        ls.alias("ls"),
    )
    psl = spark.createDataFrame([(s,) for s in PSL], "sfx: string")
    m = (
        lab.join(
            F.broadcast(psl.withColumnRenamed("sfx", "m2")),
            F.col("last2") == F.col("m2"),
            "left",
        )
        .join(
            F.broadcast(psl.withColumnRenamed("sfx", "m1")),
            F.col("last1") == F.col("m1"),
            "left",
        )
        .select(
            "doc_id",
            "host",
            "ls",
            F.coalesce(F.col("m2"), F.col("m1")).alias("sfx"),
        )
    )
    reg = m.select(
        "doc_id",
        "host",
        "sfx",
        F.concat(
            F.element_at(
                F.col("ls"),
                (F.size("ls") - F.size(F.split(F.col("sfx"), "\\."))).cast("int"),
            ),
            F.lit("."),
            F.col("sfx"),
        ).alias("reg_domain"),
    )
    return reg.groupBy("reg_domain", F.col("sfx").alias("public_suffix")).agg(
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.count(F.lit(1)).cast("long").alias("n_urls"),
    )


# ------------------------------------------------------- adaptive politeness
_AIMD_HOSTS = 50
_AIMD_INIT = 1_000_000  # rates in integer micro-requests/s: exact everywhere
_AIMD_STEP = 100_000
_AIMD_FLOOR = 125_000
_AIMD_CEIL = 10_000_000


@query(
    "q94_aimd_rate_control",
    oracle=f"""
    WITH e AS (SELECT user_id % {_AIMD_HOSTS} AS host, ts, event_id,
                      CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fail
               FROM events),
    a AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(fail) AS BIGINT) AS n_errors,
                 list(fail ORDER BY ts, event_id) AS fl
          FROM e GROUP BY host)
    SELECT host, n_events, n_errors,
           CAST(list_reduce(
             list_prepend(CAST({_AIMD_INIT} AS BIGINT), fl),
             (acc, x) -> CASE WHEN x = 1
                              THEN greatest(acc // 2, {_AIMD_FLOOR})
                              ELSE least(acc + {_AIMD_STEP}, {_AIMD_CEIL}) END
           ) AS BIGINT) AS rate_micro,
           CAST(list_reduce(
             list_prepend(CAST({_AIMD_INIT} AS BIGINT), fl),
             (acc, x) -> CASE WHEN x = 1
                              THEN greatest(acc // 2, {_AIMD_FLOOR})
                              ELSE least(acc + {_AIMD_STEP}, {_AIMD_CEIL}) END
           ) AS DOUBLE) / 1000000.0 AS rate_rps
    FROM a
    """,
)
def q94_aimd_rate_control(spark, sf_dir):
    """AIMD adaptive per-host rate control: replay each host's fetch
    outcomes in (ts, event_id) order through the classic congestion
    fold — success adds 0.1 req/s (capped at 10), an 'error' outcome
    HALVES the rate (floored at 0.125) — yielding the politeness rate the
    next crawl round should use. All arithmetic is integer micro-units
    (add / integer-halve / clamp), so the fold is bit-exact across
    engines, partitionings, and replays — no float drift ever.

    Scale shape: ONE exchange on host; the fold itself is inherently
    sequential per key, so it runs as an in-memory array fold per host
    (collect_list + aggregate, JVM-side). That bounds memory by
    events-per-host-per-window — the production form folds per (host,
    day) partitions and carries the closing rate forward, which is
    exactly the arbitrary-stateful shape `streaming/stateful.py`'s token
    bucket already implements; this query certifies the fold math the
    stateful operator applies incrementally. Reference semantic:
    exponential backoff on failures (parallel_scraper_manager.py
    retry loop) generalized to per-host additive-increase /
    multiplicative-decrease."""
    e = t(spark, sf_dir, "events").select(
        (F.col("user_id") % _AIMD_HOSTS).alias("host"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("fail"),
    )
    a = e.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("fail").cast("long").alias("n_errors"),
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "fail"))).alias("evs"),
    )
    fold = F.expr(
        f"aggregate(transform(evs, s -> s.fail), CAST({_AIMD_INIT} AS BIGINT),"
        " (acc, x) -> CASE WHEN x = 1"
        f" THEN greatest(acc div 2, CAST({_AIMD_FLOOR} AS BIGINT))"
        f" ELSE least(acc + CAST({_AIMD_STEP} AS BIGINT), CAST({_AIMD_CEIL} AS BIGINT)) END)"
    )
    return a.select(
        "host",
        "n_events",
        "n_errors",
        fold.cast("long").alias("rate_micro"),
        (fold.cast("double") / F.lit(1000000.0)).alias("rate_rps"),
    )


# ------------------------------------------------------------------ q97
# DUST rule mining: fetch-log records (url, content fingerprint) derived
# deterministically from documents. Per doc: two /p/ records differing
# ONLY in sid= (same content -> sid is provably irrelevant), plus one
# /q/ record where distinct docs share a path and differ in v= (removing
# v merges different contents -> v is provably load-bearing); a= varies
# across docs but never within a stripped group (insufficient evidence).
_DUST_RECS_SQL = """
    SELECT 'https://' || lower(source) || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           || '?a=' || CAST(doc_id % 3 AS VARCHAR)
           || '&sid=' || CAST(doc_id AS VARCHAR) AS url,
           md5(text) AS fp FROM documents
    UNION ALL
    SELECT 'https://' || lower(source) || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           || '?a=' || CAST(doc_id % 3 AS VARCHAR)
           || '&sid=' || CAST(doc_id + 1000000 AS VARCHAR),
           md5(text) FROM documents
    UNION ALL
    SELECT 'https://' || lower(source) || '.example.com/q/' || CAST(doc_id % 50 AS VARCHAR)
           || '?v=' || CAST(doc_id AS VARCHAR), md5(text) FROM documents
"""

_DUST_SUPPORT = 5  # rule needs >= this many multi-URL witness groups


@query(
    "q97_dust_param_rules",
    oracle=f"""
    WITH recs AS ({_DUST_RECS_SQL}),
    pp AS (
      SELECT url, fp,
             split_part(url, '?', 1) AS base,
             split_part(split_part(url, '?', 1), '/', 3) AS host,
             string_split(split_part(url, '?', 2), '&') AS kvs
      FROM recs),
    perparam AS (
      SELECT host, url, fp, split_part(kv, '=', 1) AS param,
             base || '?' ||
             COALESCE(array_to_string(
               list_filter(kvs, x -> split_part(x, '=', 1) <> split_part(kv, '=', 1)),
               '&'), '') AS stripped
      FROM pp, LATERAL (SELECT UNNEST(kvs) AS kv) _),
    grp AS (
      SELECT host, param, stripped,
             CAST(COUNT(*) AS BIGINT) AS n_urls,
             (MIN(fp) <> MAX(fp)) AS fp_conflict
      FROM perparam GROUP BY host, param, stripped)
    SELECT host, param,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n_urls >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
           CAST(SUM(CASE WHEN n_urls >= 2 AND fp_conflict THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           (SUM(CASE WHEN n_urls >= 2 THEN 1 ELSE 0 END) >= {_DUST_SUPPORT}
            AND SUM(CASE WHEN n_urls >= 2 AND fp_conflict THEN 1 ELSE 0 END) = 0)
             AS removable
    FROM grp GROUP BY host, param
    """,
)
def q97_dust_param_rules(spark, sf_dir):
    """DUST rule mining (Bar-Yossef et al. 2007, "Do Not Crawl in the
    DUST" — public literature): LEARN which URL query parameters are
    content-irrelevant from the fetch log itself, instead of shipping a
    hand-written strip-list. For every (host, param): group fetched URLs
    by the URL with that param removed; a group holding >= 2 distinct
    URLs but ONE distinct content fingerprint is evidence the param is
    dead weight, >= 2 fingerprints is a counterexample. A rule is
    emitted (removable=true) at >= {sup} witness groups and zero
    counterexamples, and feeds the C1 canonicalizer (q37) — at 10^10
    URLs, stripping one session-id param halves the frontier.

    Scale shape: records -> per-param explode is a zero-shuffle
    projection (split/filter/array_join, all codegen — no UDF, no
    regex backtracking); then TWO map-side-combined hash aggregates,
    first on (host, param, stripped_url) — the natural key the fetch
    log is already host-partitioned by, so the exchange is
    politeness-colocated — then on (host, param), whose output is
    O(hosts x params): tiny. "group saw >= 2 distinct contents" is
    computed as MIN(fp) <> MAX(fp) — two single-phase map-side-combined
    aggregates instead of a distinct-aggregate expansion (one fewer
    exchange; only the >=2 threshold is ever consumed).

    Reference semantic: the reference fetches a fixed per-source URL
    list (config.py:15-72) and its URLs carry no tracking params; an
    open crawl meets ?sessionid= on half the web and must learn to
    strip it (the reference's exact-id dedupe,
    enhanced_batch_processor.py:515-519, is the downstream consumer).
    """.format(sup=_DUST_SUPPORT)
    d = t(spark, sf_dir, "documents")
    host = F.concat(F.lower(F.col("source")), F.lit(".example.com"))
    fp = F.md5(F.col("text"))
    p_base = F.concat(
        F.lit("https://"), host, F.lit("/p/"), F.col("doc_id").cast("string")
    )
    a_kv = F.concat(F.lit("?a="), (F.col("doc_id") % 3).cast("string"))
    recs = d.select(
        F.explode(
            F.array(
                F.concat(
                    p_base, a_kv, F.lit("&sid="), F.col("doc_id").cast("string")
                ),
                F.concat(
                    p_base,
                    a_kv,
                    F.lit("&sid="),
                    (F.col("doc_id") + 1000000).cast("string"),
                ),
                F.concat(
                    F.lit("https://"),
                    host,
                    F.lit("/q/"),
                    (F.col("doc_id") % 50).cast("string"),
                    F.lit("?v="),
                    F.col("doc_id").cast("string"),
                ),
            )
        ).alias("url"),
        fp.alias("fp"),
    )
    pp = recs.select(
        "url",
        "fp",
        F.expr("split_part(url, '?', 1)").alias("base"),
        F.expr("split_part(split_part(url, '?', 1), '/', 3)").alias("host"),
        F.expr("split(split_part(url, '?', 2), '&')").alias("kvs"),
    )
    perparam = (
        pp.select("host", "url", "fp", "kvs", F.explode("kvs").alias("kv"))
        .select(
            "host",
            "url",
            "fp",
            F.expr("split_part(kv, '=', 1)").alias("param"),
            F.expr(
                "concat(split_part(url, '?', 1), '?', array_join("
                " filter(kvs, x -> split_part(x, '=', 1) <> split_part(kv, '=', 1)),"
                " '&'))"
            ).alias("stripped"),
        )
    )
    grp = perparam.groupBy("host", "param", "stripped").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        (F.min("fp") != F.max("fp")).alias("fp_conflict"),
    )
    multi = (F.col("n_urls") >= 2).cast("long")
    viol = ((F.col("n_urls") >= 2) & F.col("fp_conflict")).cast("long")
    return grp.groupBy("host", "param").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(multi).cast("long").alias("n_multi"),
        F.sum(viol).cast("long").alias("n_violations"),
        (
            (F.sum(multi) >= _DUST_SUPPORT) & (F.sum(viol) == 0)
        ).alias("removable"),
    )


# ------------------------------------------------------------------ q100
_HRW_K = 8  # current shard count; the diff is computed against K+1


def _hrw_weights(host_expr: str, k: int, hex_cast: str) -> list[str]:
    """Per-shard rendezvous weights: w_s = first-8-hex of md5(host#s) as
    BIGINT. `hex_cast` is the engine's hex-to-int spelling with {h} as
    the hex-string placeholder."""
    return [
        hex_cast.format(h=f"substr(md5({host_expr} || '#{s}'), 1, 8)")
        for s in range(k)
    ]


def _hrw_shard(ws: list[str]) -> str:
    """Portable argmax over the weight expressions (ties -> lowest shard;
    md5 ties are 2^-32 events and the CASE order settles them)."""
    m = "greatest(" + ", ".join(ws) + ")"
    cases = " ".join(
        f"WHEN {w} = {m} THEN {s}" for s, w in enumerate(ws)
    )
    return f"CASE {cases} END"


_HRW_SPARK_CAST = "CAST(conv({h}, 16, 10) AS BIGINT)"
_HRW_DUCK_CAST = "CAST('0x' || {h} AS BIGINT)"


@query(
    "q100_rendezvous_shards",
    oracle=f"""
    WITH hosts AS (SELECT DISTINCT lower(source) || '.example.com' AS host
                   FROM documents)
    SELECT host,
           CAST({_hrw_shard(_hrw_weights("host", _HRW_K, _HRW_DUCK_CAST))} AS BIGINT)
             AS shard_k{_HRW_K},
           CAST({_hrw_shard(_hrw_weights("host", _HRW_K + 1, _HRW_DUCK_CAST))} AS BIGINT)
             AS shard_k{_HRW_K + 1},
           ({_hrw_shard(_hrw_weights("host", _HRW_K, _HRW_DUCK_CAST))})
             <> ({_hrw_shard(_hrw_weights("host", _HRW_K + 1, _HRW_DUCK_CAST))})
             AS moved
    FROM hosts
    """,
)
def q100_rendezvous_shards(spark, sf_dir):
    """Rendezvous / highest-random-weight shard assignment (Thaler &
    Ravishankar 1998 — public literature): every host goes to the shard
    with the highest md5(host#shard) weight. This is how the politeness
    scheduler pins a host to ONE crawler shard (per-host state — token
    bucket, robots cache, AIMD rate — never needs cross-executor
    coordination), and the shard_k{k} vs shard_k{k1} columns are the
    elasticity proof: growing the fleet K -> K+1 relocates ONLY the
    hosts whose new shard wins the rendezvous (~1/(K+1) of them, the
    HRW minimal-disruption property, pinned by test) — consistent
    hashing without a ring.

    Scale shape: a ZERO-SHUFFLE projection — K+1 md5s and a greatest()
    per row, all whole-stage codegen; at 10^8 hosts the assignment is
    embarrassingly parallel and recomputable anywhere (no assignment
    table to store, join, or migrate). The portable argmax is a CASE
    over the weight columns (identical integer comparisons both
    engines).

    Reference semantic: the reference pins each source to a thread via
    a static dict (parallel_scraper_manager.py:52-90); an open crawl
    pins hosts to shards by hash so membership changes move O(1/K) of
    the keyspace.
    """.format(k=_HRW_K, k1=_HRW_K + 1)
    hosts = (
        t(spark, sf_dir, "documents")
        .select(
            F.concat(F.lower(F.col("source")), F.lit(".example.com")).alias("host")
        )
        .distinct()
    )
    sa = _hrw_shard(_hrw_weights("host", _HRW_K, _HRW_SPARK_CAST))
    sb = _hrw_shard(_hrw_weights("host", _HRW_K + 1, _HRW_SPARK_CAST))
    return hosts.select(
        "host",
        F.expr(f"CAST({sa} AS BIGINT)").alias(f"shard_k{_HRW_K}"),
        F.expr(f"CAST({sb} AS BIGINT)").alias(f"shard_k{_HRW_K + 1}"),
        F.expr(f"({sa}) <> ({sb})").alias("moved"),
    )


# --------------------------------------------------------- SCD-2 history
_SCD_ROUNDS = 4

_SCD_ORACLE = f"""
WITH obs AS (
  SELECT d.doc_id, k.k,
         md5(d.text || '#' || CAST((k.k * (d.doc_id % 3 + 1)) // 4 AS VARCHAR))
           AS fp
  FROM documents d
  CROSS JOIN (SELECT UNNEST(range(0, {_SCD_ROUNDS})) AS k) k
  WHERE (d.doc_id + 2 * k.k) % 7 <> 0),
marked AS (
  SELECT doc_id, k, fp,
         CASE WHEN LAG(fp) OVER w IS NULL
                OR LAG(fp) OVER w <> fp
                OR LAG(k) OVER w <> k - 1
              THEN 1 ELSE 0 END AS new_run
  FROM obs
  WINDOW w AS (PARTITION BY doc_id ORDER BY k)),
runs AS (
  SELECT doc_id, k, fp,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY k) AS run_id
  FROM marked)
SELECT doc_id, fp,
       CAST(run_id AS BIGINT) AS run_id,
       CAST(MIN(k) AS BIGINT) AS valid_from,
       CAST(MAX(k) AS BIGINT) AS valid_to,
       MAX(k) = {_SCD_ROUNDS - 1} AS is_current
FROM runs
GROUP BY doc_id, fp, run_id
"""


@query("q109_page_history_scd2", oracle=_SCD_ORACLE)
def q109_page_history_scd2(spark, sf_dir):
    """SCD-2 page-history build (slowly-changing-dimension type 2 —
    Kimball's warehouse pattern, public literature): collapse per-round
    page observations into validity INTERVALS (doc, fingerprint,
    valid_from..valid_to, is_current), the table a web archive actually
    stores instead of one row per (url, round). A new interval opens on
    content change OR on a re-appearance after absence (gaps-and-islands:
    run boundary = fingerprint differs from LAG or round skips LAG+1),
    so deletes and reinstatements are first-class, not lost. Generalizes
    q86's two-snapshot diff to full K-round history.

    Synthetic rounds: doc observed at round k iff (doc_id + 2k) % 7 != 0
    (presence churn), content version = (k * (doc_id%3 + 1)) div 4
    (docs change content zero, one, or two times across the 4 rounds);
    fingerprints are md5(text # version) — intervals compare 16-byte
    fingerprints, never full text.

    Scale shape: ONE shuffle on doc_id serves both windows (LAG and the
    running SUM share the same (doc_id, k) partitioning/ordering, so
    Catalyst evaluates them in a single Window stage — no second
    exchange), then a map-side-combinable groupBy on the same key.
    Per-url state is O(#rounds observed), embarrassingly parallel across
    10^10 urls; at scale the observation table arrives already
    url-partitioned from the catalog layout, and incremental round K+1
    maintenance touches only is_current rows (the q93 delta pattern).
    Reference semantic: the reference overwrites per run
    (enhanced_batch_processor.py resume path); an archive keeps every
    version addressable by time.
    """
    d = t(spark, sf_dir, "documents")
    obs = (
        d.select("doc_id", "text")
        .withColumn(
            "k",
            F.explode(
                F.array(*[F.lit(i).cast("long") for i in range(_SCD_ROUNDS)])
            ),
        )
        .filter((F.col("doc_id") + 2 * F.col("k")) % 7 != 0)
        .select(
            "doc_id",
            "k",
            F.md5(
                F.concat(
                    F.col("text"),
                    F.lit("#"),
                    F.expr("(k * (doc_id % 3 + 1)) div 4").cast("string"),
                )
            ).alias("fp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("k")
    marked = obs.select(
        "doc_id",
        "k",
        "fp",
        F.when(
            F.lag("fp").over(w).isNull()
            | (F.lag("fp").over(w) != F.col("fp"))
            | (F.lag("k").over(w) != F.col("k") - 1),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    runs = marked.select(
        "doc_id", "k", "fp", F.sum("new_run").over(w).alias("run_id")
    )
    return runs.groupBy("doc_id", "fp", "run_id").agg(
        F.min("k").alias("valid_from"),
        F.max("k").alias("valid_to"),
        (F.max("k") == _SCD_ROUNDS - 1).alias("is_current"),
    )


# ------------------------------------------------- discovery saturation
_DISC_ROUNDS = 6
_DISC_URLS = 4096

_DISC_ORACLE = f"""
WITH p AS (SELECT DISTINCT CAST(event_id % {_DISC_ROUNDS} AS BIGINT) AS round,
                  (event_id // {_DISC_ROUNDS}) % {_DISC_URLS} AS url
           FROM events),
f AS (SELECT url, MIN(round) AS first_round FROM p GROUP BY url),
seen AS (SELECT round, CAST(COUNT(*) AS BIGINT) AS n_seen FROM p GROUP BY round),
nw AS (SELECT first_round AS round, CAST(COUNT(*) AS BIGINT) AS n_new
       FROM f GROUP BY first_round)
SELECT s.round, s.n_seen,
       COALESCE(nw.n_new, 0) AS n_new,
       CAST(SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY s.round
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct,
       (1000 * COALESCE(nw.n_new, 0)) // s.n_seen AS new_permille
FROM seen s LEFT JOIN nw ON nw.round = s.round
"""


@query("q118_discovery_saturation", oracle=_DISC_ORACLE)
def q118_discovery_saturation(spark, sf_dir):
    """Crawl discovery-saturation curve: per round, how many distinct
    URLs were seen, how many were NEW (first-ever observation), the
    running distinct total, and the new-URL fraction in permille — the
    curve that answers "when does crawling deeper stop discovering?"
    (frontier scheduling's stop/requeue decision; the q86/q109 snapshot
    family's forward-looking twin). A URL's first round is just
    MIN(round) over its observations, so novelty needs NO
    round-over-round anti-join chain — one groupBy replaces R-1
    iterated set-differences.

    Scale shape: one distinct over (round, url) — corpus-sized but
    map-side combinable — then a url-keyed MIN groupBy and two
    round-level rollups; the cumulative window runs over R rows (the
    round count, a constant). The permille is integer division.
    Reference analog: the reference stops each source at a fixed target
    count (config.py); a web crawl stops when THIS curve flattens.
    """
    ev = t(spark, sf_dir, "events")
    p = ev.select(
        (F.col("event_id") % _DISC_ROUNDS).cast("long").alias("round"),
        (F.expr(f"event_id div {_DISC_ROUNDS}") % _DISC_URLS).alias("url"),
    ).distinct()
    f = p.groupBy("url").agg(F.min("round").alias("first_round"))
    seen = p.groupBy("round").agg(F.count(F.lit(1)).alias("n_seen"))
    nw = f.groupBy(F.col("first_round").alias("round")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("round").rowsBetween(Window.unboundedPreceding, 0)
    j = seen.join(nw, "round", "left").select(
        "round",
        "n_seen",
        F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
    )
    return j.select(
        "round",
        "n_seen",
        "n_new",
        F.sum("n_new").over(w).alias("cum_distinct"),
        F.expr("(1000 * n_new) div n_seen").alias("new_permille"),
    )


# ------------------------------------------------------------------ q127
_IP_MOD = 31  # synthetic IPs: md5(host) mod 31 -> ~3 hosts/IP at 97 hosts
_IP_HOSTS = 97
_IP_BUDGET = 100  # polite requests per IP per round


_IPQ_ORACLE = f"""
WITH u AS (
  SELECT 'h' || CAST(doc_id % {_IP_HOSTS} AS VARCHAR) || '.example.com' AS host
  FROM documents),
hq AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS queue FROM u GROUP BY host),
hip AS (SELECT host, queue,
               CAST('0x' || substr(md5(host), 1, 8) AS BIGINT) % {_IP_MOD} AS ip_id
        FROM hq),
r AS (SELECT host, queue, ip_id,
             CAST(COUNT(*) OVER (PARTITION BY ip_id) AS BIGINT) AS n_hosts,
             CAST(ROW_NUMBER() OVER (PARTITION BY ip_id
                    ORDER BY md5(host) ASC, host ASC) AS BIGINT) AS rk
      FROM hip)
SELECT host, ip_id, n_hosts, queue,
       {_IP_BUDGET} // n_hosts
         + CASE WHEN rk <= {_IP_BUDGET} % n_hosts THEN 1 ELSE 0 END AS quota,
       LEAST(queue, {_IP_BUDGET} // n_hosts
         + CASE WHEN rk <= {_IP_BUDGET} % n_hosts THEN 1 ELSE 0 END) AS n_fetch,
       queue > ({_IP_BUDGET} // n_hosts
         + CASE WHEN rk <= {_IP_BUDGET} % n_hosts THEN 1 ELSE 0 END) AS starved
FROM r
"""


@query("q127_ip_colocation_quota", oracle=_IPQ_ORACLE)
def q127_ip_colocation_quota(spark, sf_dir):
    """IP-level politeness quotas under virtual hosting — the rate
    budget real crawlers enforce per SERVER, not per hostname (RFC 9309
    politeness is per-origin, but thousands of vhosts share one IP; a
    per-host-only budget times N colocated hosts hammers the box —
    standard crawler practice, e.g. Heritrix's ip-based queue
    assignment; public literature). Hosts are mapped to synthetic IPs
    (md5(host) mod 31 — deterministic in both engines, the q80 idiom),
    the per-IP request budget is split across its hosts by exact
    integer division with the REMAINDER handed deterministically to
    the first (B mod n) hosts in (md5(host), host) order — so quotas
    sum exactly to min(budget, demand) per IP with no fractional
    requests. Emits per host: its IP, co-tenant count, queue depth,
    quota, admitted fetches, and the starvation flag.

    Scale shape: host-level rows only — the URL corpus collapses to
    per-host queue depths in one map-side-combined groupBy; the
    IP windows ride ONE exchange keyed ip_id (count + row_number on
    the same partition key = one window stage). At 10^8 hosts this is
    skinny-row work; the expensive thing it GATES (the per-URL fetch
    join) happens downstream on the politeness partitioning
    (operators/politeness.py), which this quota feeds as the per-host
    capacity. Reference semantic: the reference rate-limits per source
    config (config.py:15-72) — one scraper, one API host; an open
    crawler must discover host->server colocation and budget there."""
    u = t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("h"),
            (F.col("doc_id") % _IP_HOSTS).cast("string"),
            F.lit(".example.com"),
        ).alias("host")
    )
    hq = u.groupBy("host").agg(F.count(F.lit(1)).alias("queue"))
    ip = (
        F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
        % _IP_MOD
    )
    hip = hq.select("host", "queue", ip.alias("ip_id"))
    wc = Window.partitionBy("ip_id")
    wr = wc.orderBy(F.md5(F.col("host")).asc(), F.col("host").asc())
    r = hip.select(
        "host",
        "queue",
        "ip_id",
        F.count(F.lit(1)).over(wc).alias("n_hosts"),
        F.row_number().over(wr).cast("long").alias("rk"),
    )
    quota = F.expr(
        f"{_IP_BUDGET} div n_hosts"
        f" + (case when rk <= {_IP_BUDGET} % n_hosts then 1 else 0 end)"
    )
    return r.select(
        "host",
        "ip_id",
        "n_hosts",
        "queue",
        quota.alias("quota"),
        F.least(F.col("queue"), quota).alias("n_fetch"),
        (F.col("queue") > quota).alias("starved"),
    )


# ------------------------------------------------------------------ q129
# A robots.txt rule group applied to every host of the synthetic URL
# corpus: allow-all default, a calendar-trap disallow, a wildcard
# re-allow, and a language-section disallow. (pattern, allow) pairs;
# matching is RFC 9309 prefix+wildcard.
_ROBOTS_RULES = (
    ("/", True),
    ("/cal/", False),
    ("/cal/*7", True),
    ("/en/", False),
)

_RFC_RULES_SQL = " , ".join(
    f"('{p}', {str(a).upper()})" for p, a in _ROBOTS_RULES
)


from .graph import _TRAP_URLS_SQL as _Q129_URLS  # noqa: E402


@query(
    "q129_robots_longest_match",
    oracle=f"""
    WITH u AS (SELECT host, url,
                      regexp_replace(url, '^https://[^/]+', '') AS path
               FROM ({_Q129_URLS}) _z),
    rules AS (SELECT * FROM (VALUES {_RFC_RULES_SQL}) r(pattern, allow)),
    m AS (SELECT u.host, u.url, r.pattern, r.allow
          FROM u JOIN rules r
            ON u.path LIKE replace(r.pattern, '*', '%') || '%'),
    best AS (SELECT host, url, pattern, allow,
                    ROW_NUMBER() OVER (PARTITION BY url
                      ORDER BY length(pattern) DESC,
                               CASE WHEN allow THEN 0 ELSE 1 END ASC,
                               pattern ASC) AS rk
             FROM m)
    SELECT host, url, pattern AS matched_pattern, allow AS allowed
    FROM best WHERE rk = 1
    """,
)
def q129_robots_longest_match(spark, sf_dir):
    """RFC 9309 robots rule matching with wildcards and
    longest-match-wins — the Robots Exclusion Protocol's actual
    precedence semantics (RFC 9309 §2.2.2, public spec: the rule with
    the MOST SPECIFIC = longest matching pattern governs; on a tie the
    least restrictive, i.e. Allow, wins; '*' matches any octet
    sequence). Every URL's path is matched against the host's rule
    group — allow-all default '/', a '/cal/' trap disallow, a
    '/cal/*7' wildcard RE-allow (longer, so it overrides the disallow
    for matching paths), and an '/en/' section disallow — and the
    governing rule plus the verdict is emitted per URL. This upgrades
    operators/robots.py's plain prefix rules to the full
    wildcard-precedence semantics a real crawler must implement.

    Cross-engine determinism: wildcard match = one LIKE with
    '*'->'%' (prefix match via a trailing '%'), precedence = a total
    (pattern length desc, allow first, pattern asc) ordering — string
    ops only, no floats.

    Scale shape: the rule table is per-host tiny (dozens of rows) and
    BROADCAST; the match is a broadcast theta-join (URL x its host's
    rules — fan-out bounded by the rule-group size) and the argmax
    window rides a url-keyed exchange that at production scale is the
    frontier's politeness partitioning (host-hashed), so rule
    evaluation co-locates with scheduling — the same plan position
    robots filtering already has in plans/crawl.py. Reference
    semantic: the reference hardcodes a compliant User-Agent and never
    parses robots (wikimedia_scraper.py:36-41); a real crawler
    evaluates these rules for every frontier URL."""
    from .graph import trap_url_frame

    u = trap_url_frame(spark, sf_dir).select(
        "host",
        "url",
        F.regexp_replace(F.col("url"), "^https://[^/]+", "").alias("path"),
    )
    return rfc_longest_match(spark, u, _ROBOTS_RULES)


def rfc_longest_match(spark, u, ruleset):
    """(host, url, matched_pattern, allowed) — RFC 9309 precedence over
    a (pattern, allow) rule group: '*'->LIKE wildcard prefix match,
    longest pattern wins, Allow wins ties. Shared by q129 and q141."""
    rules = spark.createDataFrame(
        list(ruleset), schema="pattern string, allow boolean"
    )
    m = u.join(
        F.broadcast(rules),
        F.expr("path like (replace(pattern, '*', '%') || '%')"),
    )
    wb = Window.partitionBy("url").orderBy(
        F.length("pattern").desc(),
        F.when(F.col("allow"), 0).otherwise(1).asc(),
        F.col("pattern").asc(),
    )
    return (
        m.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(
            "host", "url",
            F.col("pattern").alias("matched_pattern"),
            F.col("allow").alias("allowed"),
        )
    )


# ------------------------------------------------------------------ q135
_PCA_HOSTS = 40

_PCA_ORACLE = f"""
WITH f AS (
  SELECT 'h' || CAST(user_id % {_PCA_HOSTS} AS VARCHAR) || '.example' AS host,
         (500 + ((user_id % {_PCA_HOSTS}) % 8) * 250) AS delay_ms,
         epoch_ms(ts) AS t_ms, event_id
  FROM events),
g AS (SELECT host, delay_ms, t_ms,
             t_ms - lag(t_ms) OVER (PARTITION BY host
                                    ORDER BY t_ms ASC, event_id ASC) AS gap_ms
      FROM f)
SELECT host,
       CAST(MAX(delay_ms) AS BIGINT) AS delay_ms,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(MIN(gap_ms) AS BIGINT) AS min_gap_ms,
       CAST(SUM(CASE WHEN gap_ms IS NOT NULL AND gap_ms < delay_ms
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       (SUM(CASE WHEN gap_ms IS NOT NULL AND gap_ms < delay_ms
                 THEN 1 ELSE 0 END) = 0) AS compliant
FROM g GROUP BY host
"""


@query("q135_politeness_compliance_audit", oracle=_PCA_ORACLE)
def q135_politeness_compliance_audit(spark, sf_dir):
    """Politeness-compliance audit over the fetch log — the
    after-the-fact proof (or refutation) that the scheduler honored
    each host's crawl delay, the report site owners and crawl operators
    actually exchange: per host, the declared delay, fetch count, the
    MINIMUM observed inter-fetch gap, the count of gap-below-delay
    violations, and the compliant verdict. The synthetic fetch log maps
    events onto 40 hosts with per-host declared delays
    (500 + (h%8)*250 ms — the reference's config.py:15-72 delay ladder
    reshaped); gaps are integer epoch-milliseconds, so the audit is
    bit-exact.

    Scale shape: ONE exchange keyed host — the lag window and the
    rollup ride it (the q82/q94/q125 per-key sequential-pass family);
    at production scale this key IS the politeness partitioning the
    scheduler itself used, so the audit is a free rider on the
    fetch_log layout plans/crawl.py already writes. A host's audit is
    single-list sequential exactly like its fetch queue was.

    Reference semantic: the reference SLEEPS to be polite
    (parallel_scraper_manager.py:87-97) and has no way to prove it
    was; this engine schedules deterministically (operators/
    politeness.py, W6) and AUDITS the outcome — the property test
    tests/test_politeness.py pins the scheduler, this query ships the
    production report."""
    ev = t(spark, sf_dir, "events")
    hostnum = F.col("user_id") % _PCA_HOSTS
    f = ev.select(
        F.concat(F.lit("h"), hostnum.cast("string"), F.lit(".example")).alias("host"),
        (F.lit(500) + (hostnum % 8) * 250).alias("delay_ms"),
        F.expr("unix_micros(cast(ts as timestamp)) div 1000").alias("t_ms"),
        "event_id",
    )
    w = Window.partitionBy("host").orderBy(F.col("t_ms").asc(), F.col("event_id").asc())
    g = f.select(
        "host",
        "delay_ms",
        (F.col("t_ms") - F.lag("t_ms").over(w)).alias("gap_ms"),
    )
    viol = F.sum(
        F.when(F.col("gap_ms").isNotNull() & (F.col("gap_ms") < F.col("delay_ms")), 1)
        .otherwise(0)
    ).cast("long")
    return g.groupBy("host").agg(
        F.max("delay_ms").cast("long").alias("delay_ms"),
        F.count(F.lit(1)).alias("n_fetches"),
        F.min("gap_ms").cast("long").alias("min_gap_ms"),
        viol.alias("n_violations"),
        (viol == 0).alias("compliant"),
    )


# ------------------------------------------------------------------ q139
# floor(log2(x)) for positive BIGINT x via base-2 digit length (the q119
# idiom): integer bit-length, identical in both engines.
_FL2_SPARK = "(length(conv(cast({x} as string), 10, 2)) - 1)"
_FL2_DUCK = "(length(to_base({x}, 2)) - 1)"

_LMIX_ORACLE = f"""
WITH hl AS (SELECT source || '.example.com' AS host, lang,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM documents GROUP BY source, lang),
h AS (SELECT host,
             CAST(SUM(c) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             CAST(SUM(c * {_FL2_DUCK.format(x='c')}) AS BIGINT) AS sum_clog,
             CAST(MAX(c) AS BIGINT) AS top_c
      FROM hl GROUP BY host),
top AS (SELECT host, lang AS top_lang FROM (
          SELECT host, lang, ROW_NUMBER() OVER (PARTITION BY host
                   ORDER BY c DESC, lang ASC) AS rk FROM hl)
        WHERE rk = 1)
SELECT h.host, h.n_docs, h.n_langs, t.top_lang,
       (1000 * h.top_c) // h.n_docs AS top_permille,
       (1000 * (h.n_docs * {_FL2_DUCK.format(x='h.n_docs')} - h.sum_clog))
         // h.n_docs AS entropy_millibits_floor,
       ((1000 * h.top_c) // h.n_docs < 700) AS mixed_lang
FROM h JOIN top t ON t.host = h.host
"""


@query("q139_host_language_mix", oracle=_LMIX_ORACLE)
def q139_host_language_mix(spark, sf_dir):
    """Host-level language-mix report — the per-host signal that feeds
    crawl targeting (language-scoped crawls skip wrong-language hosts)
    and spam triage (parked / auto-translated / scraped-mashup hosts
    show abnormally HIGH language entropy — public crawl practice, e.g.
    CommonCrawl's per-host language annotations): per host, doc count,
    distinct languages, the majority language with its integer-permille
    share, a floor-log2 entropy surrogate in millibits — EXACT integers
    via the q119 bit-length idiom, H_floor = (1000*(n*flog2(n) -
    Σc*flog2(c))) div n, zero transcendentals so cross-engine
    bit-identical — and the mixed-host flag (majority < 70%).

    Scale shape: one map-side-combined (host, lang) groupBy (the
    politeness partitioning again), then host-level rows only — the
    majority window partitions by host over ≤|langs| rows each. At
    10^8 hosts × ~10² languages this is skinny-row work end to end.
    Reference semantic: the reference pins language implicitly by
    scraping English-UI sources; an open crawl measures it per host."""
    d = t(spark, sf_dir, "documents")
    hl = d.groupBy(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"), "lang"
    ).agg(F.count(F.lit(1)).alias("c"))
    clog = F.expr("c * " + _FL2_SPARK.format(x="c"))
    h = hl.groupBy("host").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sum(clog).cast("long").alias("sum_clog"),
        F.max("c").cast("long").alias("top_c"),
    )
    wt = Window.partitionBy("host").orderBy(F.col("c").desc(), F.col("lang").asc())
    top = (
        hl.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") == 1)
        .select("host", F.col("lang").alias("top_lang"))
    )
    share = F.expr("(1000 * top_c) div n_docs")
    ent = F.expr(
        "(1000 * (n_docs * "
        + _FL2_SPARK.format(x="n_docs")
        + " - sum_clog)) div n_docs"
    )
    return h.join(top, "host").select(
        "host",
        "n_docs",
        "n_langs",
        "top_lang",
        share.alias("top_permille"),
        ent.alias("entropy_millibits_floor"),
        (share < 700).alias("mixed_lang"),
    )


# ------------------------------------------------------------------ q141
# Snapshot B of the robots rule group: the '/cal/*7' re-allow is GONE
# (calendar section fully closed) and '/fr/' is newly disallowed.
_ROBOTS_RULES_B = (
    ("/", True),
    ("/cal/", False),
    ("/en/", False),
    ("/fr/", False),
)

_RULESET_SQL_A = " , ".join(
    f"('{p}', {str(a).upper()})" for p, a in _ROBOTS_RULES
)
_RULESET_SQL_B = " , ".join(
    f"('{p}', {str(a).upper()})" for p, a in _ROBOTS_RULES_B
)

_RDIFF_VERDICT = """
  SELECT host, url, allow FROM (
    SELECT u.host, u.url, r.allow,
           ROW_NUMBER() OVER (PARTITION BY u.url
             ORDER BY length(r.pattern) DESC,
                      CASE WHEN r.allow THEN 0 ELSE 1 END ASC,
                      r.pattern ASC) AS rk
    FROM u JOIN rules_{s} r
      ON u.path LIKE replace(r.pattern, '*', '%') || '%') _
  WHERE rk = 1
"""


@query(
    "q141_robots_change_impact",
    oracle=f"""
    WITH u AS (SELECT host, url,
                      regexp_replace(url, '^https://[^/]+', '') AS path
               FROM ({_Q129_URLS}) _z),
    rules_a AS (SELECT * FROM (VALUES {_RULESET_SQL_A}) r(pattern, allow)),
    rules_b AS (SELECT * FROM (VALUES {_RULESET_SQL_B}) r(pattern, allow)),
    va AS ({_RDIFF_VERDICT.format(s='a')}),
    vb AS ({_RDIFF_VERDICT.format(s='b')})
    SELECT va.host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(CASE WHEN va.allow THEN 1 ELSE 0 END) AS BIGINT) AS allowed_a,
           CAST(SUM(CASE WHEN vb.allow THEN 1 ELSE 0 END) AS BIGINT) AS allowed_b,
           CAST(SUM(CASE WHEN vb.allow AND NOT va.allow THEN 1 ELSE 0 END)
                AS BIGINT) AS gained,
           CAST(SUM(CASE WHEN va.allow AND NOT vb.allow THEN 1 ELSE 0 END)
                AS BIGINT) AS lost
    FROM va JOIN vb ON vb.url = va.url
    GROUP BY va.host
    """,
)
def q141_robots_change_impact(spark, sf_dir):
    """Robots-policy change impact analysis — when a site ships a new
    robots.txt, the crawler must know WHAT IT JUST LOST (pages newly
    disallowed: stop scheduling, consider tombstoning) and gained
    (newly allowed sections: enqueue for discovery) BEFORE the next
    round — the robots analog of q86's snapshot CDC, run against the
    frontier at policy-refresh time (operators/robots.py's as-of join
    decides WHICH snapshot applies; this query quantifies the diff
    between consecutive snapshots). Both snapshots are evaluated under
    full RFC 9309 precedence (the q129 machinery, shared helper); the
    fixture's snapshot B closes the '/cal/*7' loophole and newly
    disallows '/fr/'. Per host: URL count, allowed under A and B, and
    the gained/lost flip counts.

    Scale shape: two broadcast rule-group evaluations over the same URL
    frame (each = one broadcast theta-join + a url-keyed window, the
    audited q129 shape), one url-keyed equi-join to pair verdicts, one
    host rollup — every exchange on the url/host politeness
    partitioning the frontier already maintains. Reference semantic:
    none — the reference never reads robots at all; real crawl ops
    treat a robots change as a production event needing a blast-radius
    report."""
    from .graph import trap_url_frame

    u = trap_url_frame(spark, sf_dir).select(
        "host",
        "url",
        F.regexp_replace(F.col("url"), "^https://[^/]+", "").alias("path"),
    )
    va = rfc_longest_match(spark, u, _ROBOTS_RULES).select(
        "host", "url", F.col("allowed").alias("allow_a")
    )
    vb = rfc_longest_match(spark, u, _ROBOTS_RULES_B).select(
        "url", F.col("allowed").alias("allow_b")
    )
    j = va.join(vb, "url")
    return j.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.when(F.col("allow_a"), 1).otherwise(0)).cast("long").alias("allowed_a"),
        F.sum(F.when(F.col("allow_b"), 1).otherwise(0)).cast("long").alias("allowed_b"),
        F.sum(F.when(F.col("allow_b") & ~F.col("allow_a"), 1).otherwise(0))
        .cast("long")
        .alias("gained"),
        F.sum(F.when(F.col("allow_a") & ~F.col("allow_b"), 1).otherwise(0))
        .cast("long")
        .alias("lost"),
    )


# ------------------------------------------------------------------ q147
_JAIN_HOSTS = 40


@query(
    "q147_fetch_fairness_index",
    oracle=f"""
    WITH per AS (SELECT user_id % {_JAIN_HOSTS} AS host,
                        CAST(COUNT(*) AS BIGINT) AS x
                 FROM events GROUP BY user_id % {_JAIN_HOSTS}),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sx2,
                 CAST(MAX(x) AS BIGINT) AS mx,
                 CAST(MIN(x) AS BIGINT) AS mn
          FROM per)
    SELECT n AS n_hosts, sx AS total_fetches, mn AS min_fetches,
           mx AS max_fetches,
           sx * sx AS jain_num,
           n * sx2 AS jain_den,
           (1000 * sx * sx) // (n * sx2) AS fairness_permille,
           ((1000 * sx * sx) // (n * sx2) >= 900) AS fair
    FROM s
    """,
)
def q147_fetch_fairness_index(spark, sf_dir):
    """Jain's fairness index over per-host fetch allocation — THE
    standard fairness metric for shared-resource schedulers (Jain,
    Chiu & Hawe 1984 — public literature): J = (Σx)² / (n·Σx²), 1.0 =
    perfectly even, 1/n = one host hogs everything. Reported as exact
    BIGINT numerator/denominator plus integer permille (the q133
    moment-sum idiom — no floats, bit-identical everywhere;
    BIGINT-safe while Σx < ~3·10^9, i.e. per-round or per-day windows
    at web scale — decimal(38,0) is the documented promotion past
    that). The crawl-ops reading: the politeness scheduler
    (operators/politeness.py) deliberately caps per-host rates, so a
    LOW J here is not unfairness but skewed demand — this index is the
    drift alarm that tells operators the host mix changed (pairs with
    q103's water-filling allocator, which maximizes exactly this J
    under budget).

    Scale shape: one map-side-combined host rollup, then a 1-row
    all-reduce of five integers. Reference semantic: the reference's
    per-source counters (parallel_scraper_manager.py:447-461) eyeballed
    for balance; this is the number that eyeball becomes."""
    per = (
        t(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % _JAIN_HOSTS).alias("host"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    s = per.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.max("x").cast("long").alias("mx"),
        F.min("x").cast("long").alias("mn"),
    )
    pm = F.expr("(1000 * sx * sx) div (n * sx2)")
    return s.select(
        F.col("n").alias("n_hosts"),
        F.col("sx").alias("total_fetches"),
        F.col("mn").alias("min_fetches"),
        F.col("mx").alias("max_fetches"),
        (F.col("sx") * F.col("sx")).alias("jain_num"),
        (F.col("n") * F.col("sx2")).alias("jain_den"),
        pm.alias("fairness_permille"),
        (pm >= 900).alias("fair"),
    )


# ------------------------------------------------------------------ q150
_ROUND_CAP = 4


@query(
    "q150_crawl_round_report",
    oracle=f"""
    WITH u AS ({_URLS_SQL}),
    seen AS (SELECT doc_id FROM u WHERE doc_id % 2 = 0),
    fresh AS (SELECT u.* FROM u WHERE NOT EXISTS
              (SELECT 1 FROM seen s WHERE s.doc_id = u.doc_id)),
    sched AS (SELECT host, doc_id, priority,
                     ROW_NUMBER() OVER (PARTITION BY host
                       ORDER BY priority DESC, doc_id ASC) - 1 AS slot
              FROM fresh),
    adm AS (SELECT * FROM sched WHERE slot < {_ROUND_CAP})
    SELECT c.host,
           c.n_candidates,
           COALESCE(f.n_new, 0) AS n_new,
           COALESCE(a.n_scheduled, 0) AS n_scheduled,
           COALESCE(f.n_new, 0) - COALESCE(a.n_scheduled, 0) AS n_deferred,
           COALESCE(a.last_offset_s, CAST(0 AS DOUBLE)) AS last_offset_s
    FROM (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_candidates
          FROM u GROUP BY host) c
    LEFT JOIN (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_new
               FROM fresh GROUP BY host) f ON f.host = c.host
    LEFT JOIN (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_scheduled,
                      CAST(MAX(slot) AS DOUBLE) * 2.0 AS last_offset_s
               FROM adm GROUP BY host) a ON a.host = c.host
    """,
)
def q150_crawl_round_report(spark, sf_dir):
    """One complete crawl round as a single oracle-checked composition —
    the engine's flagship plan (SURVEY.md §3 EP1: candidates →
    seen-set anti-join (J2) → per-host politeness slots (P1/W6) →
    capacity admission (L4)) run end to end on the contract's synthetic
    URL world and reported per host: candidate count, post-dedup new
    count, admitted count under the 4-slot token bucket, the DEFERRED
    remainder (next round's backlog — what the frontier table carries
    forward), and the last admitted fetch's politeness offset. Every
    stage is individually certified (q37/q38/q36); this query certifies
    their COMPOSITION — the same stage order `plans/crawl.py` executes
    against real pages tables, here in DuckDB-checkable form, so the
    round loop's arithmetic has a cross-engine proof, not only the
    crash/resume/property tests.

    Scale shape: exactly the crawl round's audited shape — one
    candidate-keyed anti-join exchange (Bloom-prefiltered at
    production scale, operators/dedup.py), one host-keyed
    window+rollup riding the politeness partitioning, host-level
    report rows out. Reference semantic: one iteration of
    enhanced_batch_processor.py:364-445, end to end."""
    u = _urls(spark, sf_dir)
    seen = u.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    fresh = u.join(seen, "doc_id", "left_anti")
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("doc_id").asc()
    )
    sched = fresh.withColumn("slot", F.row_number().over(w) - 1)
    adm = sched.filter(F.col("slot") < _ROUND_CAP)
    c = u.groupBy("host").agg(F.count(F.lit(1)).alias("n_candidates"))
    fnew = fresh.groupBy("host").agg(F.count(F.lit(1)).alias("n_new"))
    a = adm.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_scheduled"),
        (F.max("slot").cast("double") * 2.0).alias("last_offset_s"),
    )
    nn = F.coalesce("n_new", F.lit(0).cast("long"))
    ns = F.coalesce("n_scheduled", F.lit(0).cast("long"))
    return (
        c.join(fnew, "host", "left")
        .join(a, "host", "left")
        .select(
            "host",
            "n_candidates",
            nn.alias("n_new"),
            ns.alias("n_scheduled"),
            (nn - ns).alias("n_deferred"),
            F.coalesce("last_offset_s", F.lit(0.0)).alias("last_offset_s"),
        )
    )


# ------------------------------------------------------------------ q169
# Weighted reservoir sampling (Efraimidis & Spirakis 2006, A-Res): draw
# k items per host WITHOUT replacement with inclusion probability
# proportional to weight, in one pass, mergeable across partitions.
_WRS_HOSTS = 24
_WRS_K = 5


@query(
    "q169_weighted_reservoir_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             'h' || CAST(doc_id % {_WRS_HOSTS} AS VARCHAR) AS host,
             CAST(n_chars AS BIGINT) AS weight,
             ln((CAST(CAST('0x' || substr(md5('wrs:' || CAST(doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) AS DOUBLE) + 1.0) / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS k
      FROM documents),
    r AS (SELECT host, doc_id, weight,
                 ROW_NUMBER() OVER (PARTITION BY host
                                    ORDER BY k DESC, doc_id ASC) AS rk
          FROM d)
    SELECT host, CAST(rk AS BIGINT) AS sample_rank, doc_id, weight
    FROM r WHERE rk <= {_WRS_K}
    """,
)
def q169_weighted_reservoir_sample(spark, sf_dir):
    """Weighted reservoir sampling per host (Efraimidis & Spirakis 2006,
    algorithm A-Res): each frontier URL draws the key u^(1/w) — here the
    order-equivalent ln(u)/w — from a deterministic md5-derived uniform
    u in (0, 1], and the k largest keys per host are the sample. This
    is THE one-pass answer to "politely sample k candidate URLs per
    host, biased toward high-value pages" when the frontier is too big
    to sort: inclusion probability is proportional to weight (page
    value; n_chars stands in), the draw needs no global state, and —
    the property that matters on a cluster — per-partition top-k heaps
    MERGE exactly (max of key order is associative), so the sample of a
    10^10-row frontier is computed map-side and reconciled with one
    k-rows-per-host exchange. Deterministic u (md5 of a salted id, the
    q144 idiom) makes the sample reproducible across runs and engines —
    an auditable sample, like q167's unweighted cousin.

    Scale shape: one scan-speed projection (md5 + one ln + one divide
    per row, all codegen), then a rank window PARTITIONED by host with
    rk <= k — InferWindowGroupLimit turns it into WindowGroupLimitExec,
    so each task keeps a k-row heap per host BEFORE the exchange and
    the shuffle carries at most partitions x k rows per host (the q167
    mechanism). No global window, no driver state, no second pass.

    Cross-engine determinism: u is the same 32-bit integer both sides;
    ln and the divide are ONE identically-parenthesized expression, and
    the key is NOT emitted — ranks are insensitive to sub-ulp libm
    disagreement unless two keys collide within 1 ulp (keys are ~uniform
    over (-inf, 0), so that event has negligible measure; the rank
    itself is the only float-derived output). Reference analog: none —
    the reference fetches its fixed config list exhaustively
    (parallel_scraper_manager.py:140-178); an open crawl must sample."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % _WRS_HOSTS).cast("string")).alias(
            "host"
        ),
        F.col("n_chars").cast("long").alias("weight"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("wrs:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col("weight").cast("double")
    w = Window.partitionBy("host").orderBy(F.col("k").desc(), F.col("doc_id").asc())
    return (
        d.withColumn("k", key)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= _WRS_K)
        .select("host", "sample_rank", "doc_id", "weight")
    )
