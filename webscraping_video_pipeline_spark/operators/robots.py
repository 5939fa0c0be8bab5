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

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_robots_txt(text: str | None, user_agent: str = "*") -> tuple[list[str], float | None]:
    """Deterministic stdlib robots.txt parse -> (disallow_prefixes,
    crawl_delay_s) for the given agent.

    Standard group semantics: consecutive ``User-agent`` lines open a group;
    the most specific matching group wins (exact agent substring match over
    ``*``); ``Disallow:`` with an empty value allows everything; comments
    (``#``) stripped; unknown directives ignored. This feeds the
    ``robots_cache`` table that :func:`resolve_robots_asof` snapshots —
    the fetch of robots.txt itself is just another pre-materialized page.
    """
    if not text:
        return [], None
    groups: list[tuple[list[str], list[str], float | None]] = []  # (agents, disallows, delay)
    agents: list[str] = []
    disallows: list[str] = []
    delay: float | None = None
    in_agent_run = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_agent_run and agents:
                groups.append((agents, disallows, delay))
                agents, disallows, delay = [], [], None
            agents.append(val.lower())
            in_agent_run = True
        else:
            in_agent_run = False
            if key == "disallow" and val:
                disallows.append(val)
            elif key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    pass
    if agents:
        groups.append((agents, disallows, delay))

    ua = user_agent.lower()
    best: tuple[int, list[str], float | None] | None = None  # (specificity, ...)
    for g_agents, g_dis, g_delay in groups:
        for a in g_agents:
            if a == "*":
                spec = 0
            elif a and a in ua:
                spec = len(a)
            else:
                continue
            if best is None or spec > best[0]:
                best = (spec, g_dis, g_delay)
    if best is None:
        return [], None
    return list(best[1]), best[2]


_PARSED = T.StructType(
    [
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_s", T.DoubleType(), True),
    ]
)


@F.pandas_udf(_PARSED)
def parse_robots_udf(texts: pd.Series) -> pd.DataFrame:
    parsed = [parse_robots_txt(t) for t in texts]
    return pd.DataFrame(
        {
            "disallow_prefixes": [p[0] for p in parsed],
            "crawl_delay_s": [p[1] for p in parsed],
        }
    )


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
