"""Singer-message sink format + multi-stream orchestration."""

import io
import json
import os

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal, write_wal_slices
from tap_rest_api_msdk_spark.streaming.orchestrate import run_all, start_all
from tap_rest_api_msdk_spark.streaming.singer_sink import write_singer_messages


def test_singer_message_sequence(spark):
    df = spark.createDataFrame(
        [(1, "r1", "a", 1.5), (2, "r2", "b", 2.5)],
        "seq long, repo string, path string, score double",
    )
    buf = io.StringIO()
    stats = write_singer_messages(
        df, "repos", ["repo", "path"], "seq", buf, time_extracted="2024-01-01T00:00:00Z"
    )
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    # SCHEMA -> RECORD* -> STATE (singer-sdk emission order, SURVEY §2.4)
    assert lines[0]["type"] == "SCHEMA"
    assert lines[0]["key_properties"] == ["repo", "path"]
    assert lines[0]["bookmark_properties"] == ["seq"]
    assert lines[0]["schema"]["properties"]["seq"]["type"] == ["null", "integer"]
    assert lines[0]["schema"]["properties"]["score"]["type"] == ["null", "number"]
    body = lines[1:-1]
    assert all(m["type"] == "RECORD" and m["stream"] == "repos" for m in body)
    assert {m["record"]["repo"] for m in body} == {"r1", "r2"}
    assert all(m["time_extracted"] == "2024-01-01T00:00:00Z" for m in body)
    assert lines[-1]["type"] == "STATE"
    assert (
        lines[-1]["value"]["bookmarks"]["repos"]["replication_key_value"] == 2
    )
    assert stats == {"records": 2, "bookmark": 2}


def _two_stream_setup(spark, tmp_path):
    wal_dirs = {}
    for name, seed in (("alpha", 1), ("beta", 2)):
        d = str(tmp_path / f"wal_{name}")
        wal = synth_repo_wal(spark, 2000, n_repos=4, n_paths=10, seed=seed)
        wal.write.mode("overwrite").parquet(d + "/full")
        wal_dirs[name] = d + "/full"
    config = {
        "pagination_request_style": "default",
        "streams": [
            {"name": "alpha", "primary_keys": ["repo", "path"], "replication_key": "seq"},
            {"name": "beta", "primary_keys": ["repo", "path"], "replication_key": "seq"},
        ],
    }
    return config, wal_dirs


def test_run_all_batch_two_streams(spark, tmp_path):
    config, wal_dirs = _two_stream_setup(spark, tmp_path)
    tables = run_all(spark, config, wal_dirs, str(tmp_path / "lake"))
    assert set(tables) == {"alpha", "beta"}
    n_alpha = tables["alpha"].to_df().count()
    n_beta = tables["beta"].to_df().count()
    assert n_alpha > 0 and n_beta > 0
    # different seeds -> independent streams resolved independently
    assert tables["alpha"].bookmarks()["alpha"] == 1999
    assert tables["beta"].bookmarks()["beta"] == 1999
    a = {tuple(r) for r in tables["alpha"].to_df().select("repo", "path", "commit").collect()}
    b = {tuple(r) for r in tables["beta"].to_df().select("repo", "path", "commit").collect()}
    assert a != b


def test_start_all_concurrent_streams(spark, tmp_path):
    config, wal_dirs = _two_stream_setup(spark, tmp_path)
    # slice the WALs so the concurrent tails take several triggers
    for name in list(wal_dirs):
        src = spark.read.parquet(wal_dirs[name])
        d = str(tmp_path / f"slices_{name}")
        write_wal_slices(src, d, 3)
        wal_dirs[name] = d
    tables = start_all(
        spark, config, wal_dirs, str(tmp_path / "lake2"), max_files_per_trigger=1
    )
    batch_tables = run_all(
        spark, config, {n: str(tmp_path / f"slices_{n}") for n in wal_dirs},
        str(tmp_path / "lake3"),
    )
    for name in ("alpha", "beta"):
        s = {tuple(r) for r in tables[name].to_df().select("repo", "path", "seq").collect()}
        t = {tuple(r) for r in batch_tables[name].to_df().select("repo", "path", "seq").collect()}
        assert s == t, name


def test_run_all_mixed_payload_formats(spark, tmp_path):
    """One tap config, two streams with DIFFERENT WAL encodings (JSON
    payload vs pre-shredded struct): the orchestrator resolves each from
    the parquet schema alone and both converge to the same state."""
    wal_j = synth_repo_wal(spark, 1500, n_repos=4, n_paths=10, seed=7)
    wal_s = synth_repo_wal(spark, 1500, n_repos=4, n_paths=10, seed=7, shredded=True)
    dirs = {}
    for name, df in (("jsonic", wal_j), ("shredded", wal_s)):
        d = str(tmp_path / f"wal_{name}")
        df.write.parquet(d)
        dirs[name] = d
    config = {
        "streams": [
            {"name": "jsonic", "primary_keys": ["repo", "path"], "replication_key": "seq"},
            {"name": "shredded", "primary_keys": ["repo", "path"], "replication_key": "seq"},
        ]
    }
    tables = run_all(spark, config, dirs, str(tmp_path / "lake"))
    cols = ["repo", "path", "seq", "commit", "content"]
    a = sorted(tuple(r) for r in tables["jsonic"].to_df().select(*cols).collect())
    b = sorted(tuple(r) for r in tables["shredded"].to_df().select(*cols).collect())
    assert a == b and len(a) > 0
