"""Time-window semantics on ``events`` (SURVEY.md §2.10): tumbling, sliding,
session windows, lag deltas, and the as-of join — the batch-equivalent plans
of the Structured Streaming operators in ``streaming/`` (same groupBy
expressions; streaming adds watermarks, which don't change complete results
on a closed input).

Timestamps never leave as raw values: window bounds are formatted to strings
(cross-engine hash stability).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import query, t

_FMT = "yyyy-MM-dd HH:mm:ss"


# ------------------------------------------------------------- tumbling
@query(
    "q21_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q21_tumbling_hourly(spark, sf_dir):
    """Tumbling-window rate metrics (q/s monitoring analog —
    SURVEY §2.10 'windows'); streaming twin in streaming/windows.py."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# -------------------------------------------------------------- sliding
@query(
    "q23_sliding_hourly_by_30m",
    oracle="""
    WITH assigned AS (
      SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - o.off * INTERVAL '30 minutes',
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             value
      FROM events, (SELECT 0 AS off UNION ALL SELECT 1) o)
    SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
    FROM assigned GROUP BY window_start
    """,
)
def q23_sliding_hourly_by_30m(spark, sf_dir):
    """Sliding window (1h, slide 30m): each event lands in 2 windows."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("total_value"),
        )
        .select(F.date_format("w.start", _FMT).alias("window_start"), "n", "total_value")
    )


# -------------------------------------------------------------- session
@query(
    "q22_session_windows",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
)
def q22_session_windows(spark, sf_dir):
    """Per-host crawl sessions via session_window (gap 30m) — SURVEY §2.10
    'session windows — new capability'. Oracle: gaps-and-islands SQL.

    Note: Spark's session_window merges on overlap of [ts, ts+gap); with a
    strict-> test on the lag this matches events where gap > 30m starts a
    new session.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            "n_events",
        )
    )


# ------------------------------------------------------------- lag deltas
@query(
    "q24_interevent_gaps",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(date_diff('millisecond',
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS DOUBLE)
               / 1000.0 AS gap_s
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           CAST(SUM(CAST(gap_s AS DECIMAL(38,10))) AS DOUBLE) AS total_gap_s,
           CAST(MIN(gap_s) AS DOUBLE) AS min_gap_s
    FROM d WHERE gap_s IS NOT NULL GROUP BY event_type
    """,
)
def q24_interevent_gaps(spark, sf_dir):
    """Inter-frame/lag deltas (W5 — cut_scene_validator.py:127-147 frame
    diffs) as per-user inter-event gaps."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ts = F.col("ts").cast("timestamp")  # parquet yields TIMESTAMP_NTZ; UTC session
    # DuckDB date_diff('millisecond', a, b) counts ms-boundary crossings =
    # trunc(b, ms) - trunc(a, ms); replicate exactly.
    ms = F.floor(F.unix_micros(ts) / 1000)
    gap_s = (ms - F.lag(ms).over(w)).cast("double") / 1000.0
    return (
        e.withColumn("gap_s", gap_s)
        .filter(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.sum(F.col("gap_s").cast("decimal(38,10)")).cast("double").alias("total_gap_s"),
            F.min("gap_s").alias("min_gap_s"),
        )
    )


# ---------------------------------------------------------------- as-of
@query(
    "q45_asof_last_click_before_purchase",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id AS purchase_id,
           strftime(MAX(c.ts), '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
    GROUP BY p.event_id
    """,
)
def q45_asof_last_click_before_purchase(spark, sf_dir):
    """As-of join (SURVEY §2.3: 'latest robots snapshot at fetch time'):
    for each purchase, the latest click of the same user at or before it.
    Implemented as range join + max; the engine's robots resolver uses the
    same shape (operators/robots.py)."""
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    return (
        p.join(c, (p.user_id == c.user_id) & (c.cts <= p.pts), "left")
        .groupBy("purchase_id")
        .agg(F.date_format(F.max("cts"), _FMT).alias("last_click_ts"))
    )
