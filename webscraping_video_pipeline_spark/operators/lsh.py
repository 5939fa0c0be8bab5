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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tight cap for MinHash band buckets (q25/q50): real buckets at sf0.1
#: max out at ~21 docs; 64 only triggers on degenerate content.
MINHASH_BUCKET_CAP = 64

#: Loose degenerate-input guard for the 16-bit SimHash toy bands (q53):
#: the 4-bit band space makes buckets corpus-fraction-sized by design
#: (the production shape — 64-bit SimHash with 16-bit bands, i.e. 65536
#: buckets — is implemented in q73, where the tight cap applies); 4096
#: only catches adversarial constant-content floods without breaking
#: the pigeonhole completeness guarantee on ordinary input.
SIMHASH_BUCKET_CAP = 4096


def cap_buckets(
    df: DataFrame,
    keys: list[str],
    cap: int,
    observe_as=None,
) -> DataFrame:
    """Drop rows belonging to buckets (groups of ``keys``) larger than
    ``cap``.

    Implementation (round 4, per the r3 advisor): a ``groupBy(keys)``
    census — map-side partial-combined, so the shuffle carries only
    (key, count) pairs, never the signature rows — filtered to the
    oversize keys and broadcast back as a LEFT ANTI join. The earlier
    window-count form shuffled the FULL signature frame on the bucket
    key and (contrary to its docstring) was not exchange-reused by the
    downstream self-join: BENCH/PLANS.md r3 showed q25 going 2 -> 6
    shuffles. Oversize keys are by-construction few (ordinary content
    never trips the cap), so the broadcast side is tiny; the guarded
    frame itself is scanned twice but never extra-shuffled.

    ``observe_as``: a metric name (str) or a ``pyspark.sql.Observation``;
    when set, the census side reports ``rows_in_oversize_buckets`` and
    ``max_bucket_size`` so truncation is visible, not silent.
    """
    sizes = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("_bsz")
    )
    if observe_as is not None:
        sizes = sizes.observe(
            observe_as,
            F.sum(
                F.when(F.col("_bsz") > cap, F.col("_bsz")).otherwise(F.lit(0))
            ).alias("rows_in_oversize_buckets"),
            F.max("_bsz").alias("max_bucket_size"),
        )
    oversize = sizes.filter(F.col("_bsz") > cap).select(*keys)
    return df.join(F.broadcast(oversize), keys, "left_anti")
