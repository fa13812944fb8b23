"""Regression guards for the round-1 ADVICE findings.

1. merge-key type drift must be REFUSED (silent re-bucketing otherwise)
2. rows with a NULL op column are live rows, not tombstones
3. pagination_results_limit caps records across batches on the batch path
4. P4 fake_since early exit compares datetimes, not strings
5. DLQ landing is idempotent under batch replay
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.operators.dedup import lww_dedup
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch


def test_merge_key_type_drift_refused(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    b1 = spark.createDataFrame([(1, 10, "a")], "k long, seq long, v string")
    t.merge_upsert(b1, keys=["k"], order_by=["seq"], batch_id=0)
    b2 = spark.createDataFrame([(2.5, 11, "b")], "k double, seq long, v string")
    with pytest.raises(ValueError, match="merge-key type drift"):
        t.merge_upsert(b2, keys=["k"], order_by=["seq"], batch_id=1)
    # non-key columns still widen additively
    b3 = spark.createDataFrame([(3, 12, 4.5)], "k long, seq long, extra double")
    stats = t.merge_upsert(b3, keys=["k"], order_by=["seq"], batch_id=1)
    assert not stats.get("skipped")


def test_null_op_rows_are_live(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    rows = [(1, 10, "upsert", "x"), (2, 11, None, "y"), (3, 12, "delete", "z")]
    df = spark.createDataFrame(rows, "k long, seq long, op string, v string")
    t.merge_upsert(df, keys=["k"], order_by=["seq"], batch_id=0, op_col="op")
    live = {r.k for r in t.to_df(drop_deletes=True).collect()}
    assert live == {1, 2}  # NULL-op row 2 must survive

    out = lww_dedup(df, ["k"], ["seq"], drop_delete_op_col="op")
    assert {r.k for r in out.collect()} == {1, 2}


def test_result_limit_caps_across_batches(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").alias("seq"), F.lit("v").alias("v")
    )
    conf = PipelineConfig(
        stream="s", keys=["k"], replication_key="seq", order_by=["seq"],
        op_col=None, payload_col=None, result_limit=30, num_buckets=4,
    )
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    s0 = process_batch(t, conf, df.filter("seq < 20"), 0)
    s1 = process_batch(t, conf, df.filter("seq >= 20 and seq < 60"), 1)
    s2 = process_batch(t, conf, df.filter("seq >= 60"), 2)
    assert not s0.get("skipped") and not s1.get("skipped")
    assert s2.get("result_limit_reached")
    rows = t.to_df().count()
    assert rows == 30  # 20 from batch 0, capped 10 from batch 1
    assert (t.current_manifest() or {}).get("records_committed") == 30


def test_fake_since_datetime_compare():
    from tap_rest_api_msdk_spark.plans.planner import _rep_date_before

    # offset-aware comparison: 09:00+02:00 == 07:00Z, so it is NOT before
    # 06:30Z even though "0" < "2" makes the string compare say it is
    assert not _rep_date_before("2024-01-01T09:00:00+02:00", "2024-01-01T06:30:00Z")
    assert _rep_date_before("2024-01-01T05:00:00Z", "2024-01-01T06:30:00+00:00")
    # unparseable values fall back to string order
    assert _rep_date_before("abc", "abd")


def test_dlq_replay_is_idempotent(spark, tmp_path):
    import json

    good = json.dumps({"a": 1})
    rows = [(1, 1, good), (2, 2, "{not-json")]
    df = spark.createDataFrame(rows, "k long, seq long, payload string")
    conf = PipelineConfig(
        stream="s", keys=["k"], replication_key="seq", order_by=["seq"],
        op_col=None, payload_col="payload", malformed_policy="dlq", num_buckets=4,
    )
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    process_batch(t, conf, df, 0)
    dlq_dir = os.path.join(t.path, "dlq", "batch_id=0")
    n1 = spark.read.parquet(dlq_dir).count()
    # crash-replay: the same batch id is delivered again
    stats = process_batch(t, conf, df, 0)
    assert stats.get("skipped")
    assert spark.read.parquet(dlq_dir).count() == n1 == 1
