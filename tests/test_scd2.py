"""SCD Type-2 interval construction (operators/scd.py).

Covers: interval tiling (half-open, gapless, one current row per key),
delete-tombstone semantics, determinism of the (ts, seq) total order, and
the incremental-maintenance equivalence the module docstring claims —
full-history rebuild == close-current-and-append over micro-batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.operators.scd import scd2_intervals


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_intervals_tile_the_timeline(spark):
    ev = spark.createDataFrame(
        [
            ("k1", 1, 10, "a"),
            ("k1", 2, 20, "b"),
            ("k1", 3, 30, "c"),
            ("k2", 4, 15, "x"),
        ],
        "key string, seq long, ts long, payload string",
    )
    out = scd2_intervals(ev, ["key"], ["ts", "seq"], "ts").select(
        "key", "seq", "valid_from", "valid_to", "is_current"
    )
    got = _rows(out)
    assert got == sorted(
        [
            ("k1", 1, 10, 20, 0),
            ("k1", 2, 20, 30, 0),
            ("k1", 3, 30, None, 1),
            ("k2", 4, 15, None, 1),
        ]
    )
    # exactly one current row per key; valid_to of row i == valid_from of i+1
    cur = out.filter("is_current = 1").groupBy("key").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_delete_tombstone_leaves_no_current_row(spark):
    ev = spark.createDataFrame(
        [
            ("k1", 1, 10, "upsert"),
            ("k1", 2, 20, "delete"),
            ("k2", 3, 10, "upsert"),
        ],
        "key string, seq long, ts long, op string",
    )
    out = scd2_intervals(ev, ["key"], ["ts", "seq"], "ts", op_col="op")
    by_key = {
        (r["key"], r["seq"]): r["is_current"] for r in out.collect()
    }
    # tombstone row is in the history but NOT current; k1 has no current row
    assert by_key[("k1", 2)] == 0
    assert by_key[("k1", 1)] == 0
    assert by_key[("k2", 3)] == 1
    assert out.filter("key = 'k1' and is_current = 1").count() == 0


def test_same_ts_versions_are_ordered_by_seq(spark):
    ev = spark.createDataFrame(
        [("k", 2, 10, "later"), ("k", 1, 10, "earlier")],
        "key string, seq long, ts long, v string",
    )
    out = scd2_intervals(ev, ["key"], ["ts", "seq"], "ts")
    cur = out.filter("is_current = 1").collect()
    assert len(cur) == 1 and cur[0]["seq"] == 2


def test_incremental_close_and_append_matches_full_rebuild(spark):
    """Maintenance regime: batch 2 arrives after batch 1's SCD2 table is
    built.  Closing only the affected keys' OPEN rows and appending batch
    2's intervals must equal rebuilding from the full history — the
    O(batch) plan the module docstring promises."""
    full = [
        ("k1", 1, 10, "a"), ("k1", 2, 20, "b"), ("k1", 3, 35, "c"),
        ("k2", 4, 12, "x"),
        ("k3", 5, 30, "p"), ("k3", 6, 40, "q"),
    ]
    schema = "key string, seq long, ts long, payload string"
    batch1 = spark.createDataFrame([r for r in full if r[1] <= 4], schema)
    batch2 = spark.createDataFrame([r for r in full if r[1] > 4], schema)

    # full rebuild (the oracle)
    want = _rows(
        scd2_intervals(spark.createDataFrame(full, schema), ["key"], ["ts", "seq"], "ts")
    )

    # incremental: state after batch 1 ...
    state = scd2_intervals(batch1, ["key"], ["ts", "seq"], "ts")
    # ... batch 2's own intervals, with its first version per key closing
    # the key's open row in the existing state
    b2 = scd2_intervals(batch2, ["key"], ["ts", "seq"], "ts")
    first_new = (
        batch2.groupBy("key").agg(F.min(F.struct("ts", "seq")).alias("w"))
        .select("key", F.col("w.ts").alias("new_from"))
    )
    closed = (
        state.join(first_new, "key", "left")
        .withColumn(
            "valid_to",
            F.when(
                (F.col("is_current") == 1) & F.col("new_from").isNotNull(),
                F.col("new_from"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.when(
                (F.col("is_current") == 1) & F.col("new_from").isNotNull(), F.lit(0)
            ).otherwise(F.col("is_current")).cast("int"),
        )
        .drop("new_from")
    )
    got = _rows(closed.unionByName(b2))
    assert got == want
