"""Pre-shredded columnar WAL: replay must produce the identical lake-table
state as the JSON-payload WAL (same events, different encoding), with no
JSON parse in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, run_batch_replay


def _state(table, cols):
    df = table.to_df(drop_deletes=True).select(*cols)
    return sorted(tuple(r) for r in df.collect())


def test_shredded_replay_matches_json_replay(spark, tmp_path):
    n = 20_000
    slices = [(-1, n // 2), (n // 2, n)]
    wal_json = synth_repo_wal(spark, n)
    wal_shred = synth_repo_wal(spark, n, shredded=True)
    assert dict(wal_shred.dtypes)["payload"].startswith("struct<")

    tj = run_batch_replay(
        spark, wal_json, str(tmp_path / "tj"),
        PipelineConfig(stream="j", num_buckets=8), slices=slices,
    )
    ts = run_batch_replay(
        spark, wal_shred, str(tmp_path / "ts"),
        PipelineConfig(stream="s", num_buckets=8), slices=slices,
    )
    # common flattened columns (the JSON sample never sees always-null
    # fields because to_json drops them; the struct schema carries them)
    common = sorted(set(tj.to_df().columns) & set(ts.to_df().columns))
    assert {"repo", "path", "seq", "commit", "content", "metadata_size"} <= set(common)
    assert _state(tj, common) == _state(ts, common)
    # bookmarks advanced identically (keyed per stream name)
    assert tj.bookmarks()["j"] == ts.bookmarks()["s"] == n - 1


def test_shredded_flatten_has_no_json_parse(spark):
    from tap_rest_api_msdk_spark.functions.flatten import flatten_dataframe

    wal = synth_repo_wal(spark, 100, shredded=True)
    schema = wal.schema["payload"].dataType
    flat = flatten_dataframe(wal, "payload", schema,
                             keep_cols=[c for c in wal.columns if c != "payload"])
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "JsonToStructs" not in plan and "from_json" not in plan.lower()
    assert flat.count() == 100


def test_shredded_raw_message_roundtrip(spark):
    """_sdc_raw_json (F12) on the shredded path re-serializes the struct."""
    import json

    from tap_rest_api_msdk_spark.functions.flatten import flatten_dataframe

    wal = synth_repo_wal(spark, 10, shredded=True)
    schema = wal.schema["payload"].dataType
    flat = flatten_dataframe(wal, "payload", schema, keep_cols=["seq"],
                             store_raw_json_message=True)
    row = flat.orderBy("seq").first()
    parsed = json.loads(row["_sdc_raw_json"])
    assert parsed["content"] == row["content"]
    assert parsed["metadata"]["size"] == row["metadata_size"]
