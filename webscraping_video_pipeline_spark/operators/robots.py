"""P2 — robots.txt cache: as-of snapshot resolution + disallow filtering
(SURVEY.md §2.9 P2, §2.3 as-of join).

The reference never fetches robots.txt — it hardcodes a compliant User-Agent
and per-site delays (``wikimedia_scraper.py:36-41``, ``config.py:15-72``).
The engine makes the implied contract explicit: a ``robots_cache`` table of
(host, fetched_ts, disallow_prefixes, crawl_delay_s) snapshots.

As-of join ("latest snapshot at fetch time"): Spark has no native as-of join;
per SURVEY §2.3 we implement it as a window — filter snapshots to
``fetched_ts <= as_of``, then ``row_number() over (partition by host order by
fetched_ts desc) = 1``. The robots table is per-host (tiny relative to the
frontier), so the resolved view broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_robots_asof(robots_cache: DataFrame, as_of_ts: str | Column) -> DataFrame:
    """One row per host: the latest snapshot with fetched_ts <= as_of_ts."""
    ts = F.lit(as_of_ts).cast("timestamp") if isinstance(as_of_ts, str) else as_of_ts
    w = Window.partitionBy("host").orderBy(F.col("fetched_ts").desc())
    return (
        robots_cache.filter(F.col("fetched_ts") <= ts)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_robots(
    candidates: DataFrame,
    robots_resolved: DataFrame,
    url_col: str = "canon_url",
) -> DataFrame:
    """Drop candidates whose URL path falls under a disallowed prefix, and
    carry the robots crawl-delay override as ``robots_delay_s``.

    Path extraction and the prefix test stay JVM-side (regexp + ``exists``
    over the array — whole-stage codegen, no Python round trip).
    """
    rb = F.broadcast(
        robots_resolved.select(
            "host",
            F.col("disallow_prefixes").alias("_disallow"),
            F.col("crawl_delay_s").alias("robots_delay_s"),
        )
    )
    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+(/[^?#]*)", 1)
    disallowed = F.exists(
        F.coalesce(F.col("_disallow"), F.array().cast("array<string>")),
        lambda p: path.startswith(p),
    )
    return candidates.join(rb, "host", "left").filter(~disallowed).drop("_disallow")
