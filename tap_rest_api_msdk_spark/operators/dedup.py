"""F9 — last-writer-wins dedup (the engine-owned upsert identity).

The reference declares ``primary_keys`` per stream and delegates dedup to
the downstream Singer target (/root/reference/tap_rest_api_msdk/tap.py:66-70,
514-516). This engine owns it: within a micro-batch, keep the last writer
per key ordered by the monotonic replication key (``seq``), tie-broken by
``commit`` lexicographically (SURVEY §4 physical-execution note — a
deterministic tie-break is required so replay from any checkpoint
reconverges to byte-identical state).

Scale notes (the part that matters at 10^10 events):

* ``lww_dedup`` uses a single hash-aggregate (``max_by``-style struct-max),
  NOT a window: ``row_number() over (partition by ... order by ...)`` forces
  a full sort-per-key and keeps all rows; an aggregate gets map-side partial
  combine for free, so a key with 10^6 updates ships ONE pre-combined row
  per map partition through the shuffle. This is the same two-phase
  partial/final shape as the explicit salted variant, chosen by Catalyst
  automatically.
* ``lww_dedup_salted`` adds an explicit salt stage for pathologically hot
  keys when an operator downstream *requires* a window (e.g. keeping the
  full ordered history): pre-LWW per (key, salt), then final LWW per key.
  For the pure latest-state question, the plain aggregate already handles
  skew (partial combine), so the salted path is there for the window form
  and measured in bench.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_struct(order_cols: Sequence[str], value_cols: Sequence[str]):
    """Struct whose natural ordering = (order_cols...), carrying values."""
    return F.struct(*[F.col(c) for c in order_cols], *[F.col(c) for c in value_cols])


def lww_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    drop_delete_op_col: Optional[str] = None,
) -> DataFrame:
    """Latest row per key by (order_by...) — aggregate form (map-side combine).

    ``max(struct(order..., values...))`` is Spark's idiomatic argmax: struct
    comparison is lexicographic on fields, so the max struct is the row with
    the greatest (seq, commit, ...) — exactly LWW with deterministic
    tie-break. Columns come back in original order.

    If ``drop_delete_op_col`` names an op column, rows whose final state is
    a delete tombstone are dropped AFTER the LWW choice (a delete followed
    by nothing removes the key; a later upsert resurrects it).
    """
    value_cols = [c for c in df.columns if c not in order_by]
    agg = df.groupBy(*keys).agg(
        F.max(lww_struct(order_by, [c for c in value_cols if c not in keys])).alias("__w")
    )
    out_cols = [F.col(k) for k in keys] + [
        F.col(f"__w.{c}").alias(c) for c in df.columns if c not in keys
    ]
    out = agg.select(*out_cols)
    if drop_delete_op_col:
        out = out.filter(
            F.col(drop_delete_op_col).isNull()
            | (F.col(drop_delete_op_col) != F.lit("delete"))
        )
    return out


def lww_dedup_window(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    drop_delete_op_col: Optional[str] = None,
) -> DataFrame:
    """Window form: row_number()=1 over desc(order_by). Reference shape for
    tests; the aggregate form above is the production path."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if drop_delete_op_col:
        out = out.filter(
            F.col(drop_delete_op_col).isNull()
            | (F.col(drop_delete_op_col) != F.lit("delete"))
        )
    return out


def lww_dedup_salted(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    salt_buckets: int = 16,
    drop_delete_op_col: Optional[str] = None,
) -> DataFrame:
    """Two-phase LWW with explicit salting for hot keys (SURVEY §4.3).

    Phase 1: LWW per (keys..., salt) where salt = pmod(hash(order_by[0]), K)
    — spreads a hot (repo, path) over K reducers; phase 2: final LWW per
    key over at most K survivors. Deterministic: salt depends only on row
    content, and both phases use the same total order.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in order_by]), F.lit(salt_buckets))
    )
    phase1 = lww_dedup(salted, list(keys) + ["__salt"], order_by)
    phase2 = lww_dedup(phase1.drop("__salt"), keys, order_by)
    if drop_delete_op_col:
        phase2 = phase2.filter(
            F.col(drop_delete_op_col).isNull()
            | (F.col(drop_delete_op_col) != F.lit("delete"))
        )
    return phase2
