"""Incremental view maintenance over the net-changes stream: maintain a
grouped aggregate of the lake table WITHOUT ever recomputing it.

This is the consumer pattern the ``before``/``after`` images exist for:
a row-level diff carries enough information to update count / sum-shaped
aggregates DECREMENTALLY —

    delete: group(before) gets (-1, -before.value)
    insert: group(after)  gets (+1, +after.value)
    update: group(before) -1, group(after) +1 (a key can MOVE groups)

``agg_deltas`` turns one window's diff into per-group delta rows; folding
them into the running aggregate (driver-side dict, another LakeTable, a
database — anything additive) maintains the view incrementally.

Exactness, honestly stated: the COUNT is exact under any history
(integer deltas are self-inverse). The double SUM is exact whenever the
values are exactly representable (ints, currency in cents, the test's
values); for general doubles the incremental fold and a fresh
``F.sum`` recompute can differ by accumulated ulp residue (addition is
not associative), and a fully-retracted group can be left holding a
~1e-16 remnant rather than disappearing. Consumers needing bit-exact
sums over arbitrary doubles should cast the source column to DECIMAL
upstream (the repo's standard money pattern) or treat ~ulp-scale
residues as zero when retiring groups.

Scale shape: one aggregate over the window's diff rows (O(changed keys),
never O(table)), map-side combined, output rows = touched groups.

The reference tap has no aggregation at all (it delegates to Singer
targets, tap.py:66-70); this is the engine extension that makes the CDC
stream directly consumable for dashboard/rollup maintenance.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_deltas(
    diff: DataFrame,
    group_cols: Sequence[str],
    sum_col: Optional[str] = None,
) -> DataFrame:
    """Per-group (count delta, sum delta) rows for ONE net-changes window.

    ``group_cols`` name fields inside the ``before``/``after`` structs
    (or key columns, which live at the top level). ``sum_col`` optionally
    maintains a sum alongside the count (null values contribute 0).
    Output: group_cols..., ``d_count`` (long), ``d_sum`` (double; only
    when ``sum_col`` given).
    """
    top = set(diff.columns)

    def side(name: str, sign: int):
        cols = [
            (F.col(g) if g in top else F.col(f"{name}.{g}")).alias(g)
            for g in group_cols
        ]
        out = diff.filter(F.col(name).isNotNull()).select(
            *cols,
            F.lit(sign).cast("long").alias("d_count"),
            *(
                [
                    (
                        F.coalesce(
                            (F.col(sum_col) if sum_col in top
                             else F.col(f"{name}.{sum_col}")).cast("double"),
                            F.lit(0.0),
                        )
                        * sign
                    ).alias("d_sum")
                ]
                if sum_col
                else []
            ),
        )
        return out

    # delete/update rows retract their BEFORE image; insert/update rows
    # add their AFTER image — an update whose group did not change nets
    # to (0, value_after - value_before) for that group, which is exactly
    # the aggregate's true movement
    retract = side("before", -1)
    add = side("after", +1)
    both = retract.unionByName(add)
    aggs = [F.sum("d_count").alias("d_count")]
    if sum_col:
        aggs.append(F.sum("d_sum").alias("d_sum"))
    return (
        both.groupBy(*group_cols)
        .agg(*aggs)
        .filter(
            (F.col("d_count") != 0)
            | (F.col("d_sum") != 0.0 if sum_col else F.lit(False))
        )
    )
