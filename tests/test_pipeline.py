"""End-to-end pipeline: batch replay == streaming == DuckDB oracle;
checkpoint resumption; exactly-once under replay (SURVEY §5.2-5.5, north_rule
sha256 invariant).

The full stage chain runs in every test: WAL scan -> bookmark filter ->
native flatten of the JSON payload -> LWW merge into the lake table.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal, write_wal_slices
from tap_rest_api_msdk_spark.streaming.metrics import read_metrics
from tap_rest_api_msdk_spark.streaming.pipeline import (
    PipelineConfig,
    process_batch,
    run_batch_replay,
    run_streaming,
)

N_EVENTS = 5000


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal"))
    synth_repo_wal(spark, N_EVENTS, n_repos=10, n_paths=40, partitions=4).write.mode(
        "overwrite"
    ).parquet(d + "/full")
    wal_df = spark.read.parquet(d + "/full")
    payload_schema = spark.read.json(
        wal_df.limit(100).select("payload").rdd.map(lambda r: r[0])
    ).schema
    return wal_df, d, payload_schema


def conf(payload_schema, **kw):
    return PipelineConfig(
        stream="repo_wal", payload_col="payload", payload_schema=payload_schema, **kw
    )


# final state per (repo,path): latest non-deleted by (seq, commit);
# the north_rule invariant is sha256 of the content field
ORACLE_FINAL_STATE = """
    with ranked as (
        select *, row_number() over (
            partition by repo, path order by seq desc, commit desc
        ) as rn
        from wal
    )
    select repo, path, seq, commit,
           sha256(json_extract_string(payload, '$.content')) as content_sha
    from ranked where rn = 1 and op <> 'delete'
"""


def oracle_state(wal_path):
    con = duckdb.connect()
    con.sql(
        f"create view wal as select * from read_parquet('{wal_path}/full/*.parquet')"
    )
    rows = con.sql(ORACLE_FINAL_STATE).fetchall()
    return {(r[0], r[1]): (r[2], r[3], r[4]) for r in rows}


def spark_state(table):
    df = table.to_df().select(
        "repo", "path", "seq", "commit", F.sha2(F.col("content"), 256).alias("content_sha")
    )
    return {(r.repo, r.path): (r.seq, r.commit, r.content_sha) for r in df.collect()}


def test_one_shot_replay_matches_oracle(spark, wal, tmp_path):
    wal_df, wal_path, ps = wal
    table = run_batch_replay(spark, wal_df, str(tmp_path / "t"), conf(ps))
    assert spark_state(table) == oracle_state(wal_path)


def test_sliced_replay_matches_oracle_bookmarks_metrics(spark, wal, tmp_path):
    wal_df, wal_path, ps = wal
    slices = [(-1, 1000), (1000, 2500), (2500, N_EVENTS)]
    table = run_batch_replay(spark, wal_df, str(tmp_path / "t"), conf(ps), slices=slices)
    assert spark_state(table) == oracle_state(wal_path)
    assert table.bookmarks()["repo_wal"] == N_EVENTS - 1
    m = read_metrics(spark, table.path)
    assert m.agg(F.sum("event_count")).collect()[0][0] == N_EVENTS
    assert m.select("batch_id").distinct().count() == 3
    assert m.filter(F.col("payload_bytes") <= 0).count() == 0


def test_bulk_first_batch_overlapped_metrics_exact(spark, wal, tmp_path):
    """r5: the empty-table bulk path overlaps the lineage job with the
    merge write and resolves bookmarks/records_committed lazily at commit
    time — every commit payload must still be EXACT (bookmark = max seq,
    records_committed = event count, per-bucket metrics rows present)."""
    wal_df, wal_path, ps = wal
    table = run_batch_replay(spark, wal_df, str(tmp_path / "t"), conf(ps))
    m = table.current_manifest()
    assert table.bookmarks()["repo_wal"] == N_EVENTS - 1
    assert m["records_committed"] == N_EVENTS
    assert m["records_committed_by"] == {"repo_wal": N_EVENTS}
    mt = read_metrics(spark, table.path)
    assert mt.agg(F.sum("event_count")).collect()[0][0] == N_EVENTS
    assert mt.filter(F.col("payload_bytes") <= 0).count() == 0
    assert spark_state(table) == oracle_state(wal_path)


def test_bulk_empty_first_batch_commits_nothing(spark, wal, tmp_path):
    """An empty FIRST batch must not commit a manifest or burn the
    writer's ledger slot (the bulk path aborts between write and commit
    via _EmptyBulkBatch); the same batch_id must still be usable by the
    real first batch afterwards."""
    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable

    wal_df, wal_path, ps = wal
    table = LakeTable(spark, str(tmp_path / "t"), num_buckets=8)
    empty = wal_df.filter(F.col("seq") < 0)
    stats = process_batch(table, conf(ps), empty, batch_id=0)
    assert stats["skipped"] and stats.get("empty")
    assert table.current_manifest() is None
    # ADVICE r5: the aborted write must not leave an orphaned epoch dir of
    # empty part files (vacuum() can't reclaim it pre-first-commit)
    data_root = os.path.join(str(tmp_path / "t"), "data")
    orphans = os.listdir(data_root) if os.path.isdir(data_root) else []
    assert orphans == []
    # batch_id 0 still usable: the real bulk load lands normally
    stats = process_batch(table, conf(ps), wal_df, batch_id=0)
    assert not stats.get("skipped")
    assert spark_state(table) == oracle_state(wal_path)


def test_replayed_slice_is_exactly_once(spark, wal, tmp_path):
    wal_df, wal_path, ps = wal
    slices = [(-1, 2500), (2500, N_EVENTS)]
    table = run_batch_replay(spark, wal_df, str(tmp_path / "t"), conf(ps), slices=slices)
    before = spark_state(table)
    v = table.current_manifest()["version"]
    stats = process_batch(table, conf(ps), wal_df.filter(F.col("seq") <= 2500), batch_id=0)
    assert stats["skipped"]
    assert table.current_manifest()["version"] == v
    assert spark_state(table) == before


def test_streaming_matches_oracle_and_resumes(spark, wal, tmp_path):
    wal_df, wal_path, ps = wal
    stream_dir = str(tmp_path / "walstream")
    os.makedirs(stream_dir)
    all_slices = write_wal_slices(wal_df, str(tmp_path / "slices"), 6)
    schema = wal_df.schema
    ckpt = str(tmp_path / "ckpt")
    tpath = str(tmp_path / "t")

    # phase 1: only the first 3 slices exist; drain, "crash"
    for s in all_slices[:3]:
        os.rename(s, os.path.join(stream_dir, os.path.basename(s)))
    table, _ = run_streaming(
        spark, stream_dir, schema, tpath, conf(ps), checkpoint_dir=ckpt, max_files_per_trigger=1
    )
    assert table.to_df().count() > 0

    # phase 2 (restart): remaining slices arrive, same checkpoint
    for s in all_slices[3:]:
        os.rename(s, os.path.join(stream_dir, os.path.basename(s)))
    table, _ = run_streaming(
        spark, stream_dir, schema, tpath, conf(ps), checkpoint_dir=ckpt, max_files_per_trigger=1
    )
    assert spark_state(table) == oracle_state(wal_path)

    # phase 3: FRESH checkpoint replays everything against the same table;
    # LWW + batch-id ledger must reconverge, not duplicate or corrupt
    table, _ = run_streaming(
        spark, stream_dir, schema, tpath, conf(ps),
        checkpoint_dir=str(tmp_path / "ckpt2"), max_files_per_trigger=2,
    )
    assert spark_state(table) == oracle_state(wal_path)


def test_flattened_columns_land_in_table(spark, wal, tmp_path):
    wal_df, _, ps = wal
    table = run_batch_replay(spark, wal_df.limit(500), str(tmp_path / "t"), conf(ps))
    cols = set(table.to_df().columns)
    assert {"content", "metadata_author_name", "metadata_lang", "metadata_size", "tags"} <= cols


def test_streaming_cow_incremental_matches_oracle(spark, wal, tmp_path):
    """Structured-streaming drain with the hierarchical incremental COW
    sink: per-batch delta append + chain-triggered granular folds must
    reach the same final state as the DuckDB replay oracle."""
    wal_df, wal_path, ps = wal
    stream_dir = str(tmp_path / "walstream")
    os.makedirs(stream_dir)
    for s in write_wal_slices(wal_df, str(tmp_path / "slices"), 5):
        os.rename(s, os.path.join(stream_dir, os.path.basename(s)))
    table, _ = run_streaming(
        spark, stream_dir, wal_df.schema, str(tmp_path / "t"),
        conf(ps, sink_mode="cow_incremental", fold_every=2),
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    assert spark_state(table) == oracle_state(wal_path)


def test_steady_overlap_matches_sequential_and_aborts_empty(spark, wal, tmp_path):
    """Steady-overlap path (r6): from the second delta batch on, the
    lineage aggregate runs concurrently with the delta write, with the
    fan-out sized from the PREVIOUS batch's stats. Must be invisible in
    every durable artifact: final state, claims, ledger. An empty batch
    mid-stream aborts between write and commit (no ledger slot, no orphan
    epoch dir)."""
    wal_df, wal_path, ps = wal
    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable

    slices = [(-1, 1500), (1500, 2700), (2700, 3900), (3900, N_EVENTS)]

    def run(tdir, force_sequential):
        table = LakeTable(spark, tdir, num_buckets=8)
        c = conf(ps, sink_mode="cow_incremental")
        for i, (s, e) in enumerate(slices):
            if force_sequential:
                c._steady_est = None  # keep every batch on the exact path
            b = wal_df.filter((F.col("seq") > s) & (F.col("seq") <= e))
            st = process_batch(table, c, b, batch_id=i)
            assert not st.get("skipped")
        return table, c

    t_seq, _ = run(str(tmp_path / "seq"), True)
    t_ovl, c_ovl = run(str(tmp_path / "ovl"), False)
    assert c_ovl._steady_est is not None  # overlap actually engaged
    assert spark_state(t_seq) == spark_state(t_ovl) == oracle_state(wal_path)
    # bookmarks / ledger / record counters identical
    ms, mo = t_seq.current_manifest(), t_ovl.current_manifest()
    for k in ("bookmarks", "batch_ids", "records_committed", "num_buckets"):
        assert ms[k] == mo[k], k

    # empty batch mid-stream on the OVERLAP path: write happens, resolve
    # aborts, epoch dir reclaimed, ledger slot free
    v = mo["version"]
    n_dirs = len(os.listdir(os.path.join(str(tmp_path / "ovl"), "data")))
    st = process_batch(
        t_ovl, c_ovl, wal_df.filter(F.col("seq") < 0), batch_id=len(slices)
    )
    assert st["skipped"] and st.get("empty")
    assert t_ovl.current_manifest()["version"] == v
    assert len(os.listdir(os.path.join(str(tmp_path / "ovl"), "data"))) == n_dirs
    # the same batch_id still lands afterwards (slot not burned)
    st = process_batch(
        t_ovl, c_ovl, wal_df.filter(F.col("seq") > slices[-1][1]), batch_id=len(slices)
    )
    assert st["skipped"] or not st.get("empty")
