"""Distributed global ordinals: two-level prefix sum, no total-order task.

A naive global ``row_number() OVER (ORDER BY key)`` collapses to ONE task
(Spark warns ``WindowExec: No Partition Defined``) — at corpus scale that
single sort is THE bottleneck of any ordering layer (epoch shuffles,
decile bucketing, stable id minting). This module generalizes the
two-level prefix sum q68 (contract/quality.py) introduced for sequence
packing into a reusable operator:

1. the caller supplies a SHARD column that is monotone non-decreasing
   along the query's total order (a prefix of the sort key: leading hex
   byte of a hash key, the integer key itself, a bit-length bucket of a
   descending frequency, a block quotient of a dense id) — so shard
   boundaries respect the order and no row crosses them;
2. per-shard counts reduce map-side (one skinny exchange, |shards| rows);
3. the exclusive prefix sum OF SHARD TOTALS — |shards|² pairs, not rows —
   runs as a broadcast non-equi self-join, so the plan contains NO
   unpartitioned window at all;
4. offsets broadcast back; the within-shard ``row_number`` rides a window
   PARTITIONED by shard — parallel across shards, each task sorting only
   its shard.

Rank = shard offset + local rank, bit-identical to the single-task
``row_number`` for any total order (the shard is a coarsening of the
order, the within-shard window refines it with the full key).

The ``ntile_expr`` helper reproduces ANSI ``NTILE(k)`` exactly from
(rank, total): the first ``total % k`` buckets get ``total div k + 1``
rows, the rest ``total div k`` — all-integer arithmetic, so decile
assignments hash-match DuckDB's ``ntile`` bit for bit.

Cost note: the operator evaluates its input two or three times (local
ranks, shard counts, optional grand total). Stage an EXPENSIVE input with
``df.localCheckpoint(eager=False)`` first (the q80/kmeans staging idiom)
so every branch reads the materialized rows; a bare column projection of
a parquet scan is cheaper to just re-scan.

Reference semantic: the reference enumerates items by arrival order on a
single thread (parallel_scraper_manager.py:150-207); a cluster engine
must mint the same ordinals without ever ordering the corpus in one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sharded_ordinal(
    df: DataFrame,
    order_by: list[Column],
    shard: Column,
    out: str = "ordinal",
    total: str | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """1-based row number along ``order_by`` (a TOTAL order: include a
    tiebreak) computed shard-parallel — global, or per group when
    ``partition_by`` names grouping columns (``PARTITION BY p ORDER BY
    ...`` semantics: rank and ``total`` reset per group, so a dominant
    group — English at ~half the web — still sorts shard-parallel
    instead of in one task).

    ``shard`` must be castable to long and monotone non-decreasing along
    the order WITHIN each partition (equal-key rows may share a shard
    with their neighbors; the within-shard window re-applies the full
    key). When ``total`` is a column name, the (per-partition) row count
    is attached under it (for ntile).
    """
    pb = list(partition_by or [])
    d = df.withColumn("_ord_shard", shard.cast("long"))
    tot = d.groupBy(*pb, "_ord_shard").agg(F.count(F.lit(1)).alias("_ord_cnt"))
    lo = tot.select(
        *[F.col(p).alias(f"_ord_p_{p}") for p in pb],
        F.col("_ord_shard").alias("_ord_lo"),
        F.col("_ord_cnt").alias("_ord_locnt"),
    )
    # exclusive prefix sum of shard totals: broadcast non-equi self-join
    # over |shards|^2 PAIRS per partition (shards are hundreds-to-
    # thousands by design), deliberately not a window — the plan stays
    # free of unpartitioned WindowExec nodes
    cond = F.col("_ord_lo") < F.col("_ord_shard")
    for p in pb:
        cond = cond & (F.col(f"_ord_p_{p}") == F.col(p))
    off = (
        tot.join(F.broadcast(lo), cond, "left")
        .groupBy(*pb, "_ord_shard")
        .agg(F.coalesce(F.sum("_ord_locnt"), F.lit(0)).alias("_ord_off"))
    )
    if total is not None:
        if pb:
            ptot = tot.groupBy(*pb).agg(
                F.sum("_ord_cnt").cast("long").alias(total)
            )
            off = off.join(F.broadcast(ptot), pb)
        else:
            off = off.crossJoin(
                F.broadcast(tot.agg(F.sum("_ord_cnt").cast("long").alias(total)))
            )
    w_in = Window.partitionBy(*pb, "_ord_shard").orderBy(*order_by)
    return (
        d.withColumn("_ord_lrk", F.row_number().over(w_in).cast("long"))
        .join(F.broadcast(off), [*pb, "_ord_shard"])
        .withColumn(out, (F.col("_ord_off") + F.col("_ord_lrk")).cast("long"))
        .drop("_ord_shard", "_ord_lrk", "_ord_off")
    )


def sharded_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    shard: Column,
    value: Column,
    out: str = "prefix_sum",
    ordinal: str | None = None,
    total: str | None = None,
    value_type: str = "long",
) -> DataFrame:
    """INCLUSIVE running sum of ``value`` along ``order_by`` (a total
    order), computed shard-parallel with the same two-level discipline as
    :func:`sharded_ordinal`: per-shard value sums reduce map-side, the
    exclusive prefix sum over shard totals is a broadcast |shards|²-pair
    non-equi self-join (never an unpartitioned window), and the
    within-shard running sum rides a window PARTITIONED by shard. When
    ``ordinal``/``total`` are given, the global 1-based row number and
    grand row count ride the SAME exchanges (no second pass) — the
    combination water-filling/packing layouts need.

    ``value_type`` must make addition EXACT (the default BIGINT, or a
    decimal wide enough that no sum overflows): the two-level split
    reassociates the additions, and only exact types are associativity-
    safe, so the result stays bit-identical to the single-task window.
    Floating-point values must be rescaled to integers or decimals by
    the caller first.
    """
    d = df.withColumn("_ps_shard", shard.cast("long")).withColumn(
        "_ps_v", value.cast(value_type)
    )
    tot = d.groupBy("_ps_shard").agg(
        F.sum("_ps_v").alias("_ps_sum"), F.count(F.lit(1)).alias("_ps_cnt")
    )
    lo = tot.select(
        F.col("_ps_shard").alias("_ps_lo"),
        F.col("_ps_sum").alias("_ps_losum"),
        F.col("_ps_cnt").alias("_ps_locnt"),
    )
    off = (
        tot.join(F.broadcast(lo), F.col("_ps_lo") < F.col("_ps_shard"), "left")
        .groupBy("_ps_shard")
        .agg(
            F.coalesce(F.sum("_ps_losum"), F.lit(0)).alias("_ps_off"),
            F.coalesce(F.sum("_ps_locnt"), F.lit(0)).alias("_ps_coff"),
        )
    )
    if total is not None:
        off = off.crossJoin(
            F.broadcast(tot.agg(F.sum("_ps_cnt").cast("long").alias(total)))
        )
    w_in = Window.partitionBy("_ps_shard").orderBy(*order_by)
    res = (
        d.withColumn(
            "_ps_run",
            F.sum("_ps_v").over(w_in.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("_ps_lrk", F.row_number().over(w_in).cast("long"))
        .join(F.broadcast(off), "_ps_shard")
        .withColumn(out, (F.col("_ps_off") + F.col("_ps_run")).cast(value_type))
    )
    if ordinal is not None:
        res = res.withColumn(
            ordinal, (F.col("_ps_coff") + F.col("_ps_lrk")).cast("long")
        )
    return res.drop("_ps_shard", "_ps_v", "_ps_run", "_ps_lrk", "_ps_off", "_ps_coff")


def ntile_expr(rank: str, total: str, k: int) -> Column:
    """ANSI ``NTILE(k)`` from a 1-based global rank column and the total
    row count (both referenced BY NAME — the arithmetic stays in exact
    integer ``div``): the first ``total % k`` buckets take
    ``total div k + 1`` rows each, the remainder ``total div k``.
    """
    m = f"({total} % {k})"  # number of big buckets
    small = f"({total} div {k})"
    big = f"({small} + 1)"
    return F.expr(
        f"CASE WHEN {rank} <= {m} * {big}"
        f" THEN ({rank} + {small}) div {big}"  # ceil(rank / big)
        f" ELSE {m} + (({rank} - {m} * {big} + {small} - 1) div {small})"
        f" END"
    ).cast("long")
