"""Multi-writer manifest CAS: two concurrent merge_upsert callers never
lose a commit (VERDICT r2 item #6).

The commit point is the exclusive create of manifests/v{N}.json; a lost
race rebases (disjoint buckets / MOR deltas) or recomputes (conflicting
COW buckets). These tests drive real concurrent writers through one local
Spark session (Spark schedules jobs from multiple driver threads fine) and
compare the final state against a serial LWW oracle.
"""

from __future__ import annotations

import threading

import pytest

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.streaming.laketable import LakeTable


def _rows(spark, ids, seq, text):
    return spark.createDataFrame(
        [(i, seq, f"{text}-{i}-{seq}") for i in ids], "id long, seq long, text string"
    )


def _run_writer(spark, path, writer_id, ids, n_batches, mode, errors):
    try:
        t = LakeTable(spark, path, num_buckets=8)
        for b in range(n_batches):
            t.merge_upsert(
                _rows(spark, ids, b, writer_id),
                keys=["id"], order_by=["seq"], batch_id=b,
                mode=mode, writer_id=writer_id,
            )
    except Exception as e:  # pragma: no cover - surfaced by the assert below
        errors.append((writer_id, e))


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_two_writers_never_lose_a_commit(spark, tmp_path, mode):
    """Overlapping buckets, interleaved commits: every writer's final batch
    must be visible, final state == the LWW fixpoint."""
    path = str(tmp_path / f"tbl_{mode}")
    ids_a = list(range(0, 60))          # overlaps ids_b on [30, 60)
    ids_b = list(range(30, 90))
    errors: list = []
    th_a = threading.Thread(
        target=_run_writer, args=(spark, path, "wa", ids_a, 4, mode, errors)
    )
    th_b = threading.Thread(
        target=_run_writer, args=(spark, path, "wb", ids_b, 4, mode, errors)
    )
    th_a.start(); th_b.start(); th_a.join(120); th_b.join(120)
    assert not errors, errors

    t = LakeTable(spark, path, num_buckets=8)
    m = t.current_manifest()
    # per-writer ledger: BOTH writers' last batches committed
    assert m["batch_ids"] == {"wa": 3, "wb": 3}
    got = {r["id"]: (r["seq"], r["text"]) for r in t.to_df().collect()}
    assert set(got) == set(range(0, 90))
    for i in range(0, 90):
        seq, text = got[i]
        assert seq == 3  # the max-seq row won for every key
        # overlap keys: either writer's seq-3 row is a valid LWW winner
        # (identical seq; tie broken by arrival) — non-overlap keys must
        # carry exactly their writer's text
        if i < 30:
            assert text == f"wa-{i}-3"
        elif i >= 60:
            assert text == f"wb-{i}-3"
        else:
            assert text in (f"wa-{i}-3", f"wb-{i}-3")


def test_writer_ledgers_are_independent(spark, tmp_path):
    """Writer A at batch 5 must not suppress writer B's batch 0 (the old
    single global batch_id would have skipped it)."""
    path = str(tmp_path / "tbl_ledger")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, [1], 5, "a"), keys=["id"], order_by=["seq"],
                   batch_id=5, writer_id="wa")
    out = t.merge_upsert(_rows(spark, [2], 0, "b"), keys=["id"], order_by=["seq"],
                         batch_id=0, writer_id="wb")
    assert not out.get("skipped")
    assert {r["id"] for r in t.to_df().collect()} == {1, 2}
    # same writer replaying an old batch id IS skipped (idempotence)
    out2 = t.merge_upsert(_rows(spark, [3], 9, "a"), keys=["id"], order_by=["seq"],
                          batch_id=5, writer_id="wa")
    assert out2.get("skipped")


def test_cas_loser_rebases_metadata_without_recompute(spark, tmp_path):
    """Disjoint-bucket COW: simulate a lost race by committing another
    writer's manifest between the read and the CAS — the loser must rebase
    (keep its files, adopt the winner's entries) and both commits survive."""
    path = str(tmp_path / "tbl_rebase")
    t1 = LakeTable(spark, path, num_buckets=8)
    t1.merge_upsert(_rows(spark, range(50), 0, "base"), keys=["id"],
                    order_by=["seq"], batch_id=0)
    t2 = LakeTable(spark, path, num_buckets=8)

    # interleave: t2 commits while t1's merge_upsert is between reading the
    # manifest and publishing — emulate by publishing t2's commit first,
    # then calling t1's (its internal read sees t2's commit already; so
    # instead patch _publish to inject t2's commit once, mid-flight)
    real_publish = t1._publish
    injected = {"done": False}

    def racing_publish(manifest):
        if not injected["done"]:
            injected["done"] = True
            t2.merge_upsert(_rows(spark, [1000], 1, "w2"), keys=["id"],
                            order_by=["seq"], batch_id=0, writer_id="w2")
        return real_publish(manifest)

    t1._publish = racing_publish
    try:
        out = t1.merge_upsert(_rows(spark, [2000], 1, "w1"), keys=["id"],
                              order_by=["seq"], batch_id=1, writer_id="default")
    finally:
        t1._publish = real_publish
    assert not out.get("skipped")

    t = LakeTable(spark, path, num_buckets=8)
    ids = {r["id"] for r in t.to_df().collect()}
    assert {1000, 2000}.issubset(ids) and len(ids) == 52
    assert t.current_manifest()["batch_ids"] == {"default": 1, "w2": 0}


def test_vacuum_grace_spares_uncommitted_files(spark, tmp_path):
    import os

    path = str(tmp_path / "tbl_vac")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(10), 0, "x"), keys=["id"], order_by=["seq"], batch_id=0)
    t.merge_upsert(_rows(spark, range(10), 1, "y"), keys=["id"], order_by=["seq"], batch_id=1)
    # a fresh orphan (in-flight writer's file, not in any manifest)
    orphan_dir = os.path.join(path, "data", "epoch=inflight")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000-inflight.parquet")
    open(orphan, "wb").write(b"x")
    removed_graced = t.vacuum(retain_last=1, grace_seconds=3600)
    assert os.path.exists(orphan)
    t.vacuum(retain_last=1)  # grace 0: reclaims everything unreferenced
    assert not os.path.exists(orphan)
    assert removed_graced >= 0


def test_chaos_with_concurrent_writer(spark, tmp_path):
    """Chaos protocol + a concurrent second writer on the SAME table: the
    CDC stream replays through process_batch (writer 'default') while an
    'audit' writer merge_upserts its own keys into the same buckets. Both
    must survive every interleaving: final state == WAL LWW oracle plus
    every audit row."""
    import random

    import duckdb

    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch

    N = 4000
    d = str(tmp_path / "wal")
    synth_repo_wal(spark, N, n_repos=6, n_paths=25, skew=4.0, delete_mod=20).write.parquet(d)
    wal_df = spark.read.parquet(d)
    con = duckdb.connect()
    con.sql(f"create view wal as select * from read_parquet('{d}/*.parquet')")
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(
            """
            with ranked as (select *, row_number() over (
                partition by repo, path order by seq desc, commit desc) rn from wal)
            select repo, path, seq, commit from ranked
            where rn = 1 and op <> 'delete'
            """
        ).fetchall()
    }

    rng = random.Random(7)
    cuts = sorted(rng.sample(range(1, N), 4))
    bounds = [-1] + cuts + [N]
    slices = list(zip(bounds[:-1], bounds[1:]))
    path = str(tmp_path / "t")
    table = LakeTable(spark, path, num_buckets=8)

    stop = threading.Event()
    audit_errors: list = []
    audit_count = {"n": 0}

    def audit_writer():
        try:
            t2 = LakeTable(spark, path, num_buckets=8)
            b = 0
            while not stop.is_set() and b < 50:
                rows = spark.createDataFrame(
                    [(f"__audit__{j}", f"p{j}", 10_000_000 + b, f"c{b}")
                     for j in range(3)],
                    "repo string, path string, seq long, commit string",
                )
                t2.merge_upsert(
                    rows, keys=["repo", "path"], order_by=["seq", "commit"],
                    batch_id=b, op_col="op",
                    mode=rng.choice(["cow", "mor", "cow_incremental"]), writer_id="audit",
                )
                audit_count["n"] = b + 1
                b += 1
        except Exception as e:  # pragma: no cover
            audit_errors.append(e)

    th = threading.Thread(target=audit_writer)
    th.start()
    try:
        ps = None
        for i, (s, e) in enumerate(slices):
            conf = PipelineConfig(
                stream="chaos", payload_col="payload", payload_schema=ps,
                num_buckets=8, sink_mode=rng.choice(["cow", "mor", "cow_incremental"]),
            )
            batch = wal_df.filter((F.col("seq") > s) & (F.col("seq") <= e))
            process_batch(table, conf, batch, i)
            ps = conf.payload_schema
    finally:
        stop.set()
        th.join(180)
    assert not audit_errors, audit_errors
    assert audit_count["n"] > 0

    table = LakeTable(spark, path, num_buckets=8)
    rows = table.to_df().select("repo", "path", "seq", "commit").collect()
    got_wal = {(r.repo, r.path): (r.seq, r.commit) for r in rows
               if not r.repo.startswith("__audit__")}
    got_audit = {(r.repo, r.path): (r.seq, r.commit) for r in rows
                 if r.repo.startswith("__audit__")}
    assert got_wal == want
    last = audit_count["n"] - 1
    assert got_audit == {
        (f"__audit__{j}", f"p{j}"): (10_000_000 + last, f"c{last}") for j in range(3)
    }


def test_per_stream_result_counters_survive_interleaving(spark, tmp_path):
    """records_committed is per stream now: two pipelines with result
    limits on one table must each count only their own rows (the single
    global counter used to clobber under multi-writer)."""
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch

    d = str(tmp_path / "wal")
    synth_repo_wal(spark, 1000, n_repos=5, n_paths=10).write.parquet(d)
    wal = spark.read.parquet(d)
    path = str(tmp_path / "t")
    table = LakeTable(spark, path, num_buckets=4)

    ca = PipelineConfig(stream="sa", payload_col="payload", num_buckets=4, result_limit=300)
    cb = PipelineConfig(stream="sb", payload_col="payload", num_buckets=4, result_limit=150)
    # interleave: sa batch, sb batch, sa batch — counters must not mix
    process_batch(table, ca, wal.filter(F.col("seq") <= 200), 0)
    process_batch(table, cb, wal.filter(F.col("seq") <= 100), 0)
    out_a = process_batch(table, ca, wal.filter((F.col("seq") > 200) & (F.col("seq") <= 500)), 1)
    m = table.current_manifest()
    rc = m["records_committed_by"]
    assert rc["sa"] == 300  # capped at ITS limit, unaffected by sb's 100
    assert rc["sb"] == 101  # seq 0..100 inclusive
    # sa is now at its cap: the next batch must be refused
    out = process_batch(table, ca, wal.filter(F.col("seq") > 500), 2)
    assert out.get("result_limit_reached")
    # sb still has headroom
    out_b = process_batch(table, cb, wal.filter((F.col("seq") > 100) & (F.col("seq") <= 160)), 1)
    assert not out_b.get("result_limit_reached")
