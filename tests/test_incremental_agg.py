"""Incremental view maintenance over net-changes: folding each window's
agg_deltas into a running view must equal a full groupBy recompute at
every drain point — across inserts, group-moving updates, deletes, and
mixed sink modes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.streaming.incremental_agg import agg_deltas
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
from tap_rest_api_msdk_spark.streaming.net_changes import stream_net_changes


def _rows(spark, data):
    # (id, seq, grp, val, op)
    return spark.createDataFrame(
        [(int(i), int(s), g, float(v), op) for i, s, g, v, op in data],
        "id long, seq long, grp string, val double, op string",
    )


def test_incremental_agg_equals_recompute_at_every_window(spark, tmp_path):
    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    view = {}  # grp -> [count, sum]

    def apply(diff, batch_id, window):
        for r in agg_deltas(diff, ["grp"], sum_col="val").collect():
            c, s = view.get(r["grp"], (0, 0.0))
            c, s = c + r["d_count"], s + r["d_sum"]
            if c == 0 and s == 0.0:
                view.pop(r["grp"], None)
            else:
                view[r["grp"]] = (c, s)

    def check():
        live = t.to_df().filter(
            F.col("op").isNull() | (F.col("op") != "delete"))
        want = {
            r["grp"]: (r["n"], r["s"])
            for r in live.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
            .collect()
        }
        got = {g: (c, s) for g, (c, s) in view.items()}
        assert got == want, (got, want)

    batches = [
        # initial load: two groups
        [(i, 0, "a" if i % 2 else "b", i * 1.0, None) for i in range(20)],
        # updates that MOVE keys between groups + a value-only update
        [(1, 1, "b", 100.0, None), (2, 1, "c", 2.0, None),
         (3, 1, "a", 33.0, None)],
        # deletes + inserts in one batch
        [(1, 2, "b", 0.0, "delete"), (50, 2, "c", 5.0, None)],
        # resurrect a deleted key in a new group
        [(1, 3, "a", 7.0, None)],
    ]
    for i, data in enumerate(batches):
        t.merge_upsert(_rows(spark, data), keys=["id"], order_by=["seq"],
                       batch_id=i, op_col="op",
                       mode="mor" if i % 2 else "cow_incremental")
        stream_net_changes(t, apply, ckpt, starting_version=-1)
        check()
