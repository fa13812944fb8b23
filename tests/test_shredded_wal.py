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


def test_shredded_schema_evolution_across_batches(spark, tmp_path):
    """A shredded source whose struct gains a field mid-stream: the second
    batch's parquet schema widens the payload schema additively and old
    rows read back with nulls — same contract as JSON-payload drift."""
    from pyspark.sql import functions as F

    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch

    b1 = spark.range(0, 50).select(
        F.col("id").alias("seq"),
        F.format_string("r%02d", F.col("id") % 5).alias("repo"),
        F.format_string("p%02d", F.col("id") % 7).alias("path"),
        F.lit("c").alias("commit"),
        F.struct(F.col("id").alias("size")).alias("payload"),
    )
    b2 = spark.range(50, 100).select(
        F.col("id").alias("seq"),
        F.format_string("r%02d", F.col("id") % 5).alias("repo"),
        F.format_string("p%02d", F.col("id") % 7).alias("path"),
        F.lit("c").alias("commit"),
        F.struct(F.col("id").alias("size"), (F.col("id") * 2).alias("stars")).alias("payload"),
    )
    conf = PipelineConfig(stream="s", keys=["repo", "path"], order_by=["seq", "commit"],
                          op_col=None, num_buckets=4)
    t = LakeTable(spark, str(tmp_path / "t"), num_buckets=4)
    process_batch(t, conf, b1, 0)
    process_batch(t, conf, b2, 1)
    out = t.to_df()
    assert "stars" in out.columns
    rows = {r.seq: r.stars for r in out.collect()}
    assert all(v == s * 2 for s, v in rows.items() if s >= 50)
    assert all(v is None for s, v in rows.items() if s < 50)
