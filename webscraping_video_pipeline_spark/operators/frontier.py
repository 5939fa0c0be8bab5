"""P3 — priority frontier: per-host quotas, budget prefix, skew salting
(SURVEY.md §2.9 P3, §2.6 L1-L4).

Reference semantics preserved:

- popularity-ordered frontier (``internet_archive_scraper.py:76`` sorts
  ``downloads desc``) → ``priority DESC, url_hash ASC`` total order;
- per-scraper take-remaining caps (``parallel_scraper_manager.py:189-198``)
  → per-host/per-source top-k;
- greedy budget prefix — accumulate cost in priority order, stop at target
  (``parallel_scraper_manager.py:299-310,427-438``,
  ``enhanced_batch_processor.py:405-429``) → running-sum window filter.

Scale design: mega-hosts (FIXTURES: ≥30% of rows on 2-3 hosts) would make a
plain ``Window.partitionBy(host)`` a single straggler task. ``per_host_top_k``
is a salted two-phase top-k: phase 1 ranks within ``(host, salt)`` where
``salt = pmod(xxhash64(url_hash), s)`` and keeps k per salt-group (parallel,
bounded), phase 2 ranks the ≤ s*k survivors within ``host`` exactly. The salt
touches only the shuffle key — within-host ordering is unchanged, so the
result is byte-equal to the unsalted plan (tests assert this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _order():
    """The engine-wide deterministic candidate order (total tiebreak)."""
    return (F.col("priority").desc(), F.col("url_hash").asc())


def per_host_top_k(df: DataFrame, k: int, salts: int = 16, host_col: str = "host") -> DataFrame:
    """Exact top-k rows per host by (priority desc, url_hash asc), salted.

    Equivalent to ``row_number() over (partition by host order by ...) <= k``
    but never shuffles a whole mega-host into one task.
    """
    if salts <= 1:
        w = Window.partitionBy(host_col).orderBy(*_order())
        return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")

    salt = F.pmod(F.xxhash64(F.col("url_hash")), F.lit(salts))
    w1 = Window.partitionBy(host_col, "_salt").orderBy(*_order())
    phase1 = (
        df.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(host_col).orderBy(*_order())
    return phase1.withColumn("_rn2", F.row_number().over(w2)).filter(F.col("_rn2") <= k).drop("_rn2")


def budget_prefix(
    df: DataFrame,
    cost_col: str,
    budget: float,
    partition_col: str | None = None,
) -> DataFrame:
    """Greedy prefix: keep rows while the running cost (in priority order)
    stays ≤ budget; the first row always fits (reference keeps accumulating
    until the target is crossed — parallel_scraper_manager.py:299-310).

    With ``partition_col`` the budget applies per group (per-host variant);
    without it the window is global — callers apply it only to already
    quota-bounded batches (≤ hosts×capacity rows), never the raw frontier,
    so the single-partition global window is never the bottleneck.
    """
    w = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy(F.lit(1))
    ).orderBy(*_order()).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("_running", F.sum(F.col(cost_col)).over(w))
        .filter(
            (F.col("_running") <= budget)
            | (F.col("_running") - F.col(cost_col) == 0)  # first row always fits
        )
        .drop("_running")
    )


def fetch_join(scheduled: DataFrame, pages: DataFrame) -> DataFrame:
    """J5 — materialize the fetch: scheduled batch ⋈ pages on canonical URL.

    In the synthetic-pages world the page bytes are pre-materialized (the
    download of ``pexels_scraper.py:167-191`` et al. has no network here);
    the *scheduling* of the batch is the operator. Left join keeps misses
    (status='miss'); canonical URLs are near-unique so the join key carries
    no skew — AQE's skew-join handles residual imbalance.
    """
    pages_canon = pages  # caller pre-canonicalizes and dedups pages side
    joined = scheduled.join(pages_canon, "canon_url", "left")
    return joined.withColumn(
        "status", F.when(F.col("html").isNotNull(), "fetched").otherwise("miss")
    )
