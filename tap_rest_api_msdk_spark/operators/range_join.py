"""Range (interval) join — match rows whose timestamps fall within a
bounded window of each other, without the quadratic per-key cross product.

Spark plans ``l.ts - d <= r.ts AND r.ts < l.ts`` under an equi-key as a
join + residual filter: every (key) pair meets before filtering — fine
until a hot key. The bucketed formulation makes the RANGE part of the
join key: time is cut into window-width buckets, the right side is
emitted into its own bucket AND the next one (any left row whose window
covers a right row lives in one of those two), the join runs on
(key, bucket) — candidates per row are bounded by 2x the per-bucket
density — and the exact inequality filters the residue. This is the
standard range-join optimization (Databricks' bin hints, kdb wj).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: float,
    out_col: str = "n_in_range",
) -> DataFrame:
    """Per left row: COUNT of right rows (same ``keys``) with
    ``left.ts - window <= right.ts < left.ts``. Unmatched left rows keep
    count 0 (left-outer semantics). Bucket width == window width, so each
    right row lands in exactly 2 buckets and coverage is exact.
    """
    keys = list(keys)
    w = float(window_seconds)

    def bucket(c):
        # session tz is pinned UTC, so ntz -> timestamp is value-identity;
        # the bucket is engine-internal (the exact filter decides matches)
        epoch = F.unix_micros(c.cast("timestamp")).cast("double") / F.lit(1e6)
        return F.floor(epoch / F.lit(w)).cast("long")

    l = left.select("*", bucket(F.col(ts_col)).alias("__b"))
    r_base = right.select(
        *keys, F.col(ts_col).alias("__rts"), bucket(F.col(ts_col)).alias("__rb")
    )
    r = r_base.select(
        *keys, "__rts", F.explode(F.array(F.col("__rb"), F.col("__rb") + 1)).alias("__b")
    )
    in_range = (
        F.col("__rts").isNotNull()
        # fractional windows honored exactly (INTERVAL '<w>' SECOND takes a
        # decimal literal; int-casting would silently truncate 90.5 -> 90)
        & (F.col("__rts") >= F.col(ts_col) - F.expr(f"INTERVAL '{w}' SECOND"))
        & (F.col("__rts") < F.col(ts_col))
    )
    # count CONDITIONALLY (no pre-filter): a left row whose bucket
    # candidates all miss the exact window must still emit count 0, and
    # grouping runs over the left's full row (callers pass unique-id rows)
    group_cols = [c for c in left.columns]
    return (
        l.join(r, keys + ["__b"], "left")
        .groupBy(*group_cols)
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).cast("long").alias(out_col))
    )
