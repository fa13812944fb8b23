"""Structured-Streaming CDC reads via the Python Data Source
(`laketable_changes`): offsets are manifest versions, partitions are data
files, rows arrive as Arrow batches with __commit_version attribution.
Must agree with LakeTable.changes_since and resume exactly-once from the
Spark checkpoint."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.streaming.changes_source import (
    LakeTableChangesDataSource,
)
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable


def _rows(spark, ids, seq, text):
    return spark.createDataFrame(
        [(int(i), int(seq), f"{text}-{i}") for i in ids],
        "id long, seq long, text string",
    )


def _drain(spark, table_path, out_dir, ckpt, starting_version=None):
    reader = spark.readStream.format("laketable_changes").option("path", table_path)
    if starting_version is not None:
        reader = reader.option("starting_version", starting_version)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_changes_stream_matches_changes_since_and_resumes(spark, tmp_path):
    spark.dataSource.register(LakeTableChangesDataSource)
    path = str(tmp_path / "tbl")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(100), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, mode="cow")
    v0 = t.current_manifest()["version"]
    t.merge_upsert(_rows(spark, range(10), 1, "b1"), keys=["id"],
                   order_by=["seq"], batch_id=1, mode="mor")
    t.merge_upsert(_rows(spark, range(20, 25), 2, "b2"), keys=["id"],
                   order_by=["seq"], batch_id=2, mode="cow_incremental")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, path, out, ckpt, starting_version=v0)
    got = spark.read.parquet(out)
    want = t.changes_since(v0)
    # same change rows (modulo the __commit_version attribution column)
    cols = ["id", "seq", "text", "__bucket"]
    assert sorted(got.select(*cols).collect()) == sorted(want.select(*cols).collect())
    # commit attribution: batch-1 rows carry an earlier version than batch-2
    vers = {
        r["seq"]: r["v"]
        for r in got.groupBy("seq").agg(F.max("__commit_version").alias("v")).collect()
    }
    assert vers[1] < vers[2]

    # exactly-once resume: one more commit, SAME checkpoint -> only the
    # new rows land in the sink
    n_before = got.count()
    t.merge_upsert(_rows(spark, [77], 3, "b3"), keys=["id"],
                   order_by=["seq"], batch_id=3, mode="mor")
    _drain(spark, path, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == n_before + 1
    new = got2.filter(F.col("seq") == 3).collect()
    assert len(new) == 1 and new[0]["id"] == 77

    # maintenance commits don't surface as changes: fold/compact, drain
    # again with the same checkpoint -> nothing new
    t.compact()
    _drain(spark, path, out, ckpt)
    assert spark.read.parquet(out).count() == n_before + 1


def test_changes_stream_default_start_is_head(spark, tmp_path):
    """Without starting_version the stream begins at the CURRENT head —
    history is not replayed, only new commits arrive."""
    spark.dataSource.register(LakeTableChangesDataSource)
    path = str(tmp_path / "tbl2")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(50), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0)
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _drain(spark, path, out, ckpt)
    assert not os.path.isdir(out) or spark.read.parquet(out).count() == 0
    t.merge_upsert(_rows(spark, [1, 2], 1, "b1"), keys=["id"],
                   order_by=["seq"], batch_id=1, mode="mor")
    _drain(spark, path, out, ckpt)
    assert spark.read.parquet(out).count() == 2
