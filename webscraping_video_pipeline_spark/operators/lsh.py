"""Oversize-bucket guard for LSH candidate generation (q25 / q50 / q53).

Band-bucket self-joins are quadratic in the bucket size: one degenerate
signature — empty pages, boilerplate shells, an adversarial flood of
identical documents — turns candidate generation into an all-pairs join
at 100 TB. Production near-dup pipelines therefore cap the bucket size
and drop (or exact-dedup-route) oversize buckets: content degenerate
enough to overflow a MinHash bucket is near-certainly EXACT-duplicate
content, which the cheaper upstream exact-dedup stage (q20/q28 family)
already removes, so dropping the bucket loses no near-dup recall that
matters. SCALE.md §6's bounded-per-key-group claim is enforced here by
construction rather than asserted.

Dropping is never silent: the helper attaches a named ``observe`` metric
(rows landing in oversize buckets + the max bucket size seen) that rides
the job for any QueryExecutionListener / Observation consumer — tests
read it via ``pyspark.sql.Observation``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Tight cap for MinHash band buckets (q25/q50): real buckets at sf0.1
#: max out at ~21 docs; 64 only triggers on degenerate content.
MINHASH_BUCKET_CAP = 64

#: Loose degenerate-input guard for the 16-bit SimHash toy bands (q53):
#: the 4-bit band space makes buckets corpus-fraction-sized by design
#: (production uses a 64-bit SimHash with 16-bit bands, i.e. 65536
#: buckets, where the same tight cap applies); 4096 only catches
#: adversarial constant-content floods without breaking the pigeonhole
#: completeness guarantee on ordinary input.
SIMHASH_BUCKET_CAP = 4096


def cap_buckets(
    df: DataFrame,
    keys: list[str],
    cap: int,
    observe_as=None,
) -> DataFrame:
    """Drop rows belonging to buckets (groups of ``keys``) larger than
    ``cap``. One window count over the bucket key — the same hash
    partitioning the downstream self-join needs, so AQE/Catalyst reuse
    the exchange; the oversize bucket itself costs one O(n) count, never
    the O(n^2) pair-gen it would otherwise trigger.

    ``observe_as``: a metric name (str) or a ``pyspark.sql.Observation``;
    when set, the job reports ``rows_in_oversize_buckets`` and
    ``max_bucket_size`` so truncation is visible, not silent.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys])
    sized = df.withColumn("_bsz", F.count(F.lit(1)).over(w))
    if observe_as is not None:
        sized = sized.observe(
            observe_as,
            F.sum((F.col("_bsz") > cap).cast("long")).alias(
                "rows_in_oversize_buckets"
            ),
            F.max("_bsz").alias("max_bucket_size"),
        )
    return sized.filter(F.col("_bsz") <= cap).drop("_bsz")
