"""SCD Type-2 history construction — the canonical CDC-ingest output shape.

The reference tap emits every version of a record downstream and leaves
history semantics to the Singer target (primary_keys + replication key,
/root/reference/tap_rest_api_msdk/tap.py:66-70, 514-516).  This engine owns
the other classic materialization besides LWW latest-state
(:mod:`.dedup`): a Type-2 slowly-changing-dimension table where every
version carries a ``[valid_from, valid_to)`` interval and exactly one row
per key is current.

Scale notes (10^10 events):

* One shuffle, keyed by the business key: ``lead(ts)`` over
  ``(key) order by (order_by...)`` is the whole computation.  Unlike LWW
  (argmax -> aggregate with map-side combine), interval stitching needs
  ADJACENCY between consecutive versions, so the per-key sort is
  irreducible — this is the textbook case where a window is the right
  plan, not a degenerate one.
* Hot keys cannot be salted here (salting breaks adjacency), but the
  window state is O(1) per row (``lead`` looks ahead one row); a key with
  10^6 versions costs one sorted run, not memory.  Spark's external sort
  spills, so the plan survives skew; the cure for a pathologically hot key
  is upstream (version-count cap / key split), not in this operator.
* For the incremental regime (micro-batches into a maintained SCD2 table)
  only the per-key LAST row of the existing table can change (its open
  interval closes when a newer version arrives), so a maintenance job
  joins new batches against the ``is_current`` slice only — O(batch), not
  O(history).  That path composes from this operator plus the lake
  table's LWW merge and is exercised in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    ts_col: str,
    op_col: Optional[str] = None,
    current_flag: str = "is_current",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Turn a CDC version stream into SCD Type-2 validity intervals.

    Every input row (one version of one key) comes back with:

    * ``valid_from`` — its own ``ts_col``;
    * ``valid_to``   — the NEXT version's ``ts_col`` (null for the open,
      i.e. current, interval): half-open ``[from, to)`` intervals that
      tile each key's timeline with no gaps or overlaps;
    * ``is_current`` — 1 on the single open row per key, else 0.  When
      ``op_col`` is given and the last version is a delete tombstone, the
      key has NO current row (the tombstone row stays in the history with
      ``is_current = 0``, closing the interval it superseded).

    ``order_by`` must be a total order within a key (e.g. ``(ts, seq)``)
    so replay is deterministic — same contract as :func:`..dedup.lww_dedup`.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    nxt = F.lead(F.col(ts_col)).over(w)
    open_row = nxt.isNull()
    if op_col is not None:
        open_row = open_row & (
            F.col(op_col).isNull() | (F.col(op_col) != F.lit("delete"))
        )
    return df.select(
        *df.columns,
        F.col(ts_col).alias(valid_from),
        nxt.alias(valid_to),
        F.when(open_row, F.lit(1)).otherwise(F.lit(0)).cast("int").alias(current_flag),
    )
