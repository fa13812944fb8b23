"""As-of (temporal) join — match each left row to the latest right row at
or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the engine
implements it with the union + running-last-value pattern, which is the
scale-correct formulation:

* a naive formulation (``left join right on l.key = r.key and r.ts <= l.ts``
  + argmax) explodes to |L|x|R per key| intermediate rows — quadratic on
  hot keys;
* the union form tags both sides, sorts each key's timeline ONCE
  (single shuffle on the key — same exchange a sort-merge join would do),
  and carries the most recent right-side attributes forward with a
  running ``last(..., ignorenulls=True)`` window. Cost: O(|L|+|R|) rows
  through one exchange, skew-safe for everything except a single
  pathologically hot key (same caveat as any keyed join; salt if needed).

Tie rule: a right row with ts == left ts IS visible (inclusive), matching
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` — ties order right-before-left
in the timeline sort.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_cols: Optional[Sequence[str]] = None,
    tie_break: Optional[str] = None,
    how: str = "left",
) -> DataFrame:
    """For each left row: attributes of the latest right row (per ``keys``)
    with ``right.ts_col <= left.ts_col``.

    ``right_cols`` — right attributes to carry (default: all non-key,
    non-ts columns). ``tie_break`` — column ordering right rows that share
    (keys, ts): the max wins (make the match deterministic when the right
    side has same-timestamp versions). ``how="left"`` keeps unmatched left
    rows with nulls; ``"inner"`` drops them.
    """
    from pyspark.sql import Window

    keys = list(keys)
    rcols = list(right_cols or [c for c in right.columns if c not in keys + [ts_col]])
    lcols = [c for c in left.columns]

    r = right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts BEFORE left on ties (inclusive)
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    if tie_break and tie_break not in rcols:
        # never silently ignore the caller's determinism request: an
        # explicit right_cols list that omits the tie_break column would
        # otherwise produce a nondeterministic same-timestamp match
        raise ValueError(
            f"tie_break column {tie_break!r} is not among the carried right "
            f"columns {rcols!r}; include it in right_cols (or drop tie_break)"
        )
    tb = F.col(f"__r_{tie_break}") if tie_break else F.lit(0)
    l = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    timeline = r.unionByName(l)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), tb.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the whole right row as ONE struct: right rows always produce a
    # non-null struct, so ignorenulls skips only LEFT rows — a right
    # attribute that is genuinely NULL is still carried faithfully
    right_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(f"__r_{c}").alias(c) for c in rcols])
    )
    carried = timeline.select(
        "*", F.last(right_struct, ignorenulls=True).over(w).alias("__m")
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{c}").alias(f"{c}_asof") for c in rcols],
    )
    if how == "inner":
        out = carried.filter(
            (F.col("__side") == 1) & F.col("__m").isNotNull()
        ).select(
            *[F.col(f"__l_{c}").alias(c) for c in lcols],
            *[F.col(f"__m.{c}").alias(f"{c}_asof") for c in rcols],
        )
    return out
