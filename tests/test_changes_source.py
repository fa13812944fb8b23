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


def test_stream_tail_reconstructs_table_under_chaos(spark, tmp_path):
    """Soak: the changes stream tails a pipeline that rotates sink modes,
    replays duplicate batch ids, compacts, vacuums, and expires metadata.
    LWW-resolving everything the stream delivered must reconstruct the
    final table exactly — the CDC-consumer contract end to end."""
    import random

    from pyspark.sql import functions as F
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.pipeline import (
        PipelineConfig,
        process_batch,
    )

    spark.dataSource.register(LakeTableChangesDataSource)
    rng = random.Random(7)
    N = 4000
    wal = synth_repo_wal(spark, N, n_repos=6, n_paths=25, skew=4.0,
                         delete_mod=20, shredded=True).cache()
    wal.count()
    path = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    table = LakeTable(spark, path, num_buckets=8)
    cuts = sorted(rng.sample(range(1, N), 7))
    bounds = [-1] + cuts + [N]

    def drain():
        q = (
            spark.readStream.format("laketable_changes")
            .option("path", path).option("starting_version", -1).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        conf = PipelineConfig(
            stream="chaos", payload_col="payload", num_buckets=8,
            sink_mode=rng.choice(["cow", "mor", "cow_incremental"]),
        )
        batch = wal.filter((F.col("seq") > s) & (F.col("seq") <= e))
        process_batch(table, conf, batch, i)
        if rng.random() < 0.5:
            process_batch(table, conf, batch, i)  # duplicate delivery
        drain()  # the stream keeps pace with retention
        if rng.random() < 0.4:
            table.compact()
            table.vacuum(retain_last=6)
        if rng.random() < 0.3:
            table.expire_manifests(retain_last=30, grace_seconds=0.0)

    drain()
    streamed = spark.read.parquet(out)
    from tap_rest_api_msdk_spark.operators.dedup import lww_dedup

    resolved = (
        lww_dedup(streamed, ["repo", "path"], ["seq", "commit"])
        .filter(F.col("op").isNull() | (F.col("op") != "delete"))
    )
    got = {(r.repo, r.path): (r.seq, r.commit)
           for r in resolved.select("repo", "path", "seq", "commit").collect()}
    want = {(r.repo, r.path): (r.seq, r.commit)
            for r in table.to_df().select("repo", "path", "seq", "commit").collect()}
    assert got == want


def test_batch_changelog_read_window(spark, tmp_path):
    """Batch mode: spark.read.format('laketable_changes') with a bounded
    (start_version, end_version] window returns exactly that window's
    data-commit rows with commit attribution."""
    spark.dataSource.register(LakeTableChangesDataSource)
    path = str(tmp_path / "tbl3")
    t = LakeTable(spark, path, num_buckets=4)
    vers = []
    for b in range(4):
        t.merge_upsert(_rows(spark, range(b * 5, b * 5 + 5), b, f"b{b}"),
                       keys=["id"], order_by=["seq"], batch_id=b, mode="mor")
        vers.append(t.current_manifest()["version"])
    df = (spark.read.format("laketable_changes").option("path", path)
          .option("start_version", vers[0]).option("end_version", vers[2]).load())
    got = {(r["id"], r["__commit_version"]) for r in df.collect()}
    assert {i for i, _ in got} == set(range(5, 15))  # batches 1 and 2 only
    assert {v for _, v in got} == {vers[1], vers[2]}
    # default end = head
    df2 = (spark.read.format("laketable_changes").option("path", path)
           .option("start_version", vers[2]).load())
    assert {r["id"] for r in df2.collect()} == set(range(15, 20))


def test_batch_changelog_empty_window_returns_zero_rows(spark, tmp_path):
    """A caught-up window (start == head, or maintenance-only commits)
    must return 0 rows — PySpark hands read() a None partition for an
    empty partition list."""
    spark.dataSource.register(LakeTableChangesDataSource)
    path = str(tmp_path / "tbl4")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(10), 0, "x"), keys=["id"],
                   order_by=["seq"], batch_id=0, mode="mor")
    head = t.current_manifest()["version"]
    df = (spark.read.format("laketable_changes").option("path", path)
          .option("start_version", head).load())
    assert df.count() == 0
    # maintenance-only window: compact bumps the version, adds no changes
    t.compact()
    df2 = (spark.read.format("laketable_changes").option("path", path)
           .option("start_version", head).load())
    assert df2.count() == 0
    # both option spellings accepted on both modes
    df3 = (spark.read.format("laketable_changes").option("path", path)
           .option("starting_version", -1).load())
    assert df3.count() == 10


def test_walk_loads_only_changed_sections(spark, tmp_path, monkeypatch):
    """The commit walk's per-version cost must be O(changed buckets):
    walking N single-bucket commits on a 32-bucket split table loads
    ~2 sections per step (changed bucket, both endpoints), never
    N x 32. Pinned by counting _load_section calls with a cold cache."""
    from tap_rest_api_msdk_spark.streaming import laketable as lt

    t = lt.LakeTable(spark, str(tmp_path / "tbl"), num_buckets=32)
    t.merge_upsert(
        spark.createDataFrame([(i, 0, "b") for i in range(600)],
                              "id long, seq long, text string"),
        keys=["id"], order_by=["seq"], batch_id=0)
    v0 = t.current_manifest()["version"]
    for i in range(1, 11):  # 10 commits, one key (= one bucket) each
        t.merge_upsert(
            spark.createDataFrame([(7 * i, i, "u")],
                                  "id long, seq long, text string"),
            keys=["id"], order_by=["seq"], batch_id=i, mode="mor")
    head = t.current_manifest()["version"]

    calls = {"n": 0}
    real = lt._load_section

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(lt, "_load_section", counting)
    lt._SECTION_CACHE.clear()  # cold cache: count true loads
    added = lt.walk_added_files(str(tmp_path / "tbl"), v0, head)
    # one data commit per step; a commit may split its key's bucket into
    # several salt-slice files, so >= 10 files arrive over 10 steps
    assert len(added) >= 10
    assert {v for _f, v in added} == set(range(v0 + 1, head + 1))
    # each step loads the CHANGED bucket's section on both endpoints
    # (a handful of loads) — the all-buckets behavior would be >= 320
    assert calls["n"] <= 6 * 10, calls["n"]
