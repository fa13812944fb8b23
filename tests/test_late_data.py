"""Late-data watermark accounting (q_late_data_watermark).

The query computes the arrival-order exclusive running-max watermark as a
two-phase block scan; these tests pin (a) the scan identity — block
decomposition == the direct global window — and (b) the scale shape — no
window in the plan runs over an unpartitioned event-sized input (the block
table is the only global window, and it is n/B rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from tap_rest_api_msdk_spark import queries as Q


def _direct_global(ev):
    """Reference: the single-partition global window (test-only)."""
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        ev.withColumn("wm_prev", F.max("ts").over(w))
        .withColumn(
            "is_late",
            F.when(
                F.col("ts") < F.col("wm_prev") - F.expr("INTERVAL 30 MINUTES"),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_late").cast("long").alias("n_late"),
            F.round(F.sum("is_late") / F.count(F.lit(1)), 6).alias("late_frac"),
        )
    )


def test_block_scan_matches_direct_global_window(spark):
    got = Q.q_late_data_watermark(spark, "/root/testdata/sf0.001")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = _direct_global(ev)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_out_of_order_event_is_late(spark):
    # arrival order: t=0h, t=2h, then a straggler stamped t=1h — the
    # watermark at its arrival is 2h - 30min, so it is late; the first two
    # (watermark not yet ahead of them) are not
    rows = [
        (1000, "a", "2024-01-01 00:00:00"),
        (2000, "a", "2024-01-01 02:00:00"),
        (3000, "a", "2024-01-01 01:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts string").select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    out = _direct_global(ev).collect()
    assert [(r["n_events"], r["n_late"]) for r in out] == [(3, 1)]


def test_no_event_sized_global_window_in_plan(spark):
    df = Q.q_late_data_watermark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchange feeds the BLOCK table's window
    # (input = one row per 1000 arrivals), never the raw event scan: the
    # events-side window must be hash-partitioned by blk
    assert "hashpartitioning(blk" in plan
