"""Streaming net-changes surface (`stream_net_changes`): Structured
Streaming drives the window, the delta-walk `cdc_diff` produces exact
row-level insert/update/delete diffs per micro-batch. Applying the
streamed diffs must reconstruct the table exactly; windows must be
contiguous, pinned for crash replay, and survive resume with the
default (head) starting version."""

from __future__ import annotations

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
from tap_rest_api_msdk_spark.streaming.net_changes import stream_net_changes


def _rows(spark, ids, seq, text, op=None):
    return spark.createDataFrame(
        [(int(i), int(seq), f"{text}-{i}", op) for i in ids],
        "id long, seq long, text string, op string",
    )


class _Replica:
    """Driver-side key->attrs replica plus a window/batch audit log."""

    def __init__(self):
        self.state = {}
        self.windows = []
        self.fail_next = False

    def apply(self, diff, batch_id, window):
        if self.fail_next:
            self.fail_next = False
            raise RuntimeError("injected sink crash")
        self.windows.append((batch_id, window))
        for r in diff.collect():
            if r["change"] == "delete":
                self.state.pop(r["id"], None)
            else:
                self.state[r["id"]] = (r["after"]["seq"], r["after"]["text"])

    def assert_matches(self, table):
        live = {
            r["id"]: (r["seq"], r["text"])
            for r in table.read_state().drop("__bucket").filter(
                F.col("op").isNull() | (F.col("op") != "delete")
            ).collect()
        }
        assert self.state == live


def test_net_changes_reconstructs_table_across_modes(spark, tmp_path):
    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(60), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op", mode="cow")
    rep = _Replica()
    # full history from -1: initial snapshot arrives as inserts
    stream_net_changes(t, rep.apply, ckpt, starting_version=-1)
    assert len(rep.state) == 60
    rep.assert_matches(t)

    # mixed-mode commits incl. a delete, then drain the SAME checkpoint
    t.merge_upsert(_rows(spark, range(10), 1, "b1"), keys=["id"],
                   order_by=["seq"], batch_id=1, op_col="op", mode="mor")
    t.merge_upsert(_rows(spark, [5, 61], 2, "b2"), keys=["id"],
                   order_by=["seq"], batch_id=2, op_col="op",
                   mode="cow_incremental")
    t.merge_upsert(_rows(spark, [7], 3, "gone", op="delete"), keys=["id"],
                   order_by=["seq"], batch_id=3, op_col="op", mode="mor")
    stream_net_changes(t, rep.apply, ckpt)
    assert 7 not in rep.state and rep.state[61] == (2, "b2-61")
    rep.assert_matches(t)

    # windows are contiguous and gap-free over data commits
    wins = [w for _, w in rep.windows]
    assert wins[0][0] == -1
    for (_, e0), (s1, _) in zip(wins, wins[1:]):
        assert s1 == e0

    # maintenance-only window: compact, drain -> no apply call
    n = len(rep.windows)
    t.compact()
    stream_net_changes(t, rep.apply, ckpt)
    assert len(rep.windows) == n
    rep.assert_matches(t)


def test_net_changes_crash_replay_pins_window(spark, tmp_path):
    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(20), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op")
    rep = _Replica()
    stream_net_changes(t, rep.apply, ckpt, starting_version=-1)
    t.merge_upsert(_rows(spark, [1, 2, 3], 1, "b1"), keys=["id"],
                   order_by=["seq"], batch_id=1, op_col="op", mode="mor")
    # sink crashes mid-batch; the stream fails, window stays pinned
    import pytest

    rep.fail_next = True
    with pytest.raises(Exception, match="injected sink crash"):
        stream_net_changes(t, rep.apply, ckpt)
    # restart with the same checkpoint: the SAME window is re-presented
    before = [w for _, w in rep.windows]
    stream_net_changes(t, rep.apply, ckpt)
    after = [w for _, w in rep.windows]
    assert len(after) == len(before) + 1
    rep.assert_matches(t)


def test_net_changes_lost_ledger_fails_loudly(spark, tmp_path):
    """Deleting the window ledger while the Spark offset checkpoint
    survives must raise — silently re-seeding at the current head would
    skip every change since the last drain (or reverse the diff)."""
    import os

    import pytest

    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(5), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op")
    rep = _Replica()
    stream_net_changes(t, rep.apply, ckpt, starting_version=-1)
    os.remove(os.path.join(ckpt, "net_window.json"))
    with pytest.raises(ValueError, match="piecemeal"):
        stream_net_changes(t, rep.apply, ckpt)


def test_net_changes_default_start_survives_empty_first_drain(spark, tmp_path):
    """First drain sees no data commits (default start = head); commits
    land BETWEEN drains; the second drain must diff from the ORIGINAL
    baseline, not re-resolve it at the new head."""
    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(10), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op")
    rep = _Replica()
    stream_net_changes(t, rep.apply, ckpt)  # default start = current head
    assert rep.windows == [] and rep.state == {}
    t.merge_upsert(_rows(spark, [4], 1, "b1"), keys=["id"],
                   order_by=["seq"], batch_id=1, op_col="op", mode="mor")
    t.merge_upsert(_rows(spark, [5], 2, "b2"), keys=["id"],
                   order_by=["seq"], batch_id=2, op_col="op", mode="mor")
    stream_net_changes(t, rep.apply, ckpt)
    assert rep.state == {4: (1, "b1-4"), 5: (2, "b2-5")}


import pytest


@pytest.mark.parametrize("seed", [11, 23])
def test_net_changes_reconstructs_pipeline_table_under_chaos(spark, tmp_path, seed):
    """Soak: the NET-changes stream consumes a pipeline that rotates sink
    modes, replays duplicate batch ids, compacts, vacuums, and expires
    metadata. Applying each window's insert/update/delete diff to a
    replica must end at exactly the table's live state — the row-level
    CDC-consumer contract under full maintenance chaos. Two seeds =
    two different interleavings of modes/duplicates/maintenance."""
    import random

    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.pipeline import (
        PipelineConfig,
        process_batch,
    )

    rng = random.Random(seed)
    N = 3000
    wal = synth_repo_wal(spark, N, n_repos=6, n_paths=25, skew=4.0,
                         delete_mod=20, shredded=True).cache()
    wal.count()
    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    table = LakeTable(spark, path, num_buckets=8)
    replica = {}
    windows = []

    def apply(diff, batch_id, window):
        windows.append(window)
        attrs = [c for c in diff.columns if c not in
                 ("repo", "path", "change", "before", "after")]
        assert attrs == []
        for r in diff.collect():
            k = (r["repo"], r["path"])
            if r["change"] == "delete":
                assert k in replica
                replica.pop(k)
            else:
                if r["change"] == "insert":
                    assert k not in replica
                replica[k] = r["after"].asDict()

    cuts = sorted(rng.sample(range(1, N), 6))
    bounds = [-1] + cuts + [N]
    for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
        conf = PipelineConfig(
            stream="chaos-net", payload_col="payload", num_buckets=8,
            sink_mode=rng.choice(["cow", "mor", "cow_incremental"]),
        )
        batch = wal.filter((F.col("seq") > s) & (F.col("seq") <= e))
        process_batch(table, conf, batch, i)
        if rng.random() < 0.5:
            process_batch(table, conf, batch, i)  # duplicate delivery
        stream_net_changes(table, apply, ckpt, starting_version=-1)
        if rng.random() < 0.4:
            table.compact()
            table.vacuum(retain_last=6)
        if rng.random() < 0.3:
            table.expire_manifests(retain_last=30, grace_seconds=0.0)

    stream_net_changes(table, apply, ckpt)
    live = table.to_df()
    keycols = ["repo", "path"]
    attrcols = [c for c in live.columns if c not in keycols]
    want = {
        (r["repo"], r["path"]): {c: r[c] for c in attrcols}
        for r in live.collect()
    }
    assert replica == want
    # windows were contiguous and monotonic
    for (_, e0), (s1, _) in zip(windows, windows[1:]):
        assert s1 == e0


def test_net_changes_across_additive_schema_evolution(spark, tmp_path):
    """A column added mid-stream: diffs spanning the evolution align both
    endpoints to the CURRENT schema (old rows' new attr = typed null),
    and the replica still converges to the live table exactly."""
    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(8), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op")
    replica = {}
    windows = []

    def apply(diff, batch_id, window):
        windows.append(window)
        for r in diff.collect():
            if r["change"] == "delete":
                replica.pop(r["id"], None)
            else:
                replica[r["id"]] = r["after"].asDict()

    stream_net_changes(t, apply, ckpt, starting_version=-1)
    assert all(set(v) == {"seq", "text", "op"} for v in replica.values())

    wide = spark.createDataFrame(
        [(3, 1, "w-3", None, "en"), (9, 1, "w-9", None, "en")],
        "id long, seq long, text string, op string, lang string",
    )
    t.merge_upsert(wide, keys=["id"], order_by=["seq"], batch_id=1,
                   op_col="op", mode="mor")
    stream_net_changes(t, apply, ckpt)
    # post-evolution diff carries the new column; untouched old rows were
    # not re-delivered (their lang stays absent in the replica until a
    # full re-sync — additive evolution is not a change to live rows)
    assert replica[3]["lang"] == "en" and replica[9]["lang"] == "en"
    assert "lang" not in replica[0]
    # a full re-stream from scratch converges to the live table, nulls and all
    rep2 = {}

    def apply2(diff, batch_id, window):
        for r in diff.collect():
            rep2[r["id"]] = r["after"].asDict()

    stream_net_changes(t, apply2, str(tmp_path / "ckpt2"), starting_version=-1)
    live = t.to_df()
    attr = [c for c in live.columns if c != "id"]
    want = {r["id"]: {c: r[c] for c in attr} for r in live.collect()}
    assert rep2 == want and rep2[0]["lang"] is None


def test_net_changes_maintenance_only_drains_cache_scan_highwater(spark, tmp_path):
    """A quiet table accumulating maintenance commits must not re-walk
    the same manifest range every drain: the ledger records a verified
    scanned_to high-water mark (pinned window preserved verbatim), and a
    later data commit still diffs from the original baseline."""
    import json
    import os

    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(10), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op", mode="mor")
    rep = _Replica()
    stream_net_changes(t, rep.apply, ckpt, starting_version=-1)
    pinned = json.load(open(os.path.join(ckpt, "net_window.json")))
    # several maintenance-only commits, drained one by one
    for _ in range(3):
        t.compact()
        stream_net_changes(t, rep.apply, ckpt)
    rec = json.load(open(os.path.join(ckpt, "net_window.json")))
    head = t.current_manifest()["version"]
    assert rec["scanned_to"] == head          # verified-empty range cached
    assert rec["start"] == pinned["start"]    # pinned window untouched
    assert rec["end"] == pinned["end"]
    assert rec["batch_id"] == pinned["batch_id"]
    # a data commit after the quiet stretch: window still opens at the
    # pinned end (not at scanned_to), so nothing is skipped
    t.merge_upsert(_rows(spark, [3], 1, "b1"), keys=["id"],
                   order_by=["seq"], batch_id=1, op_col="op", mode="mor")
    stream_net_changes(t, rep.apply, ckpt)
    assert rep.windows[-1][1][0] == pinned["end"]
    rep.assert_matches(t)


def test_net_changes_consumer_races_live_writer(spark, tmp_path):
    """A writer keeps committing WHILE the consumer drains: window ends
    resolve at fire time and may run ahead of Spark's offsets, so the
    drains interleave arbitrarily with commits — the replica must still
    converge exactly once the writer stops and a final drain runs."""
    import threading

    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(50), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op")
    rep = _Replica()
    stream_net_changes(t, rep.apply, ckpt, starting_version=-1)

    stop = threading.Event()
    err: list = []

    def writer():
        # a second handle, as a real concurrent writer would hold
        tw = LakeTable(spark, path, num_buckets=4)
        try:
            for i in range(1, 9):
                tw.merge_upsert(
                    _rows(spark, [i % 7, 40 + i], i, f"w{i}"), keys=["id"],
                    order_by=["seq"], batch_id=i, op_col="op",
                    mode="mor" if i % 2 else "cow_incremental",
                    writer_id="racer",
                )
        except Exception as e:  # surface in the main thread
            err.append(e)
        finally:
            stop.set()

    th = threading.Thread(target=writer)
    th.start()
    while not stop.is_set():
        stream_net_changes(t, rep.apply, ckpt)
    th.join()
    assert not err, err
    stream_net_changes(t, rep.apply, ckpt)  # final drain to quiesced head
    rep.assert_matches(t)
    # windows stayed contiguous through every racing drain
    wins = [w for _, w in rep.windows]
    for (_, e0), (s1, _) in zip(wins, wins[1:]):
        assert s1 == e0


def test_net_changes_live_tail_processing_time(spark, tmp_path):
    """processing_time trigger: a LIVE tail keeps delivering windows as
    commits land, without re-invoking the drain helper."""
    import time as _time

    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    t = LakeTable(spark, path, num_buckets=4)
    t.merge_upsert(_rows(spark, range(20), 0, "base"), keys=["id"],
                   order_by=["seq"], batch_id=0, op_col="op")
    rep = _Replica()
    q = stream_net_changes(t, rep.apply, ckpt, starting_version=-1,
                           processing_time="250 milliseconds")
    try:
        def wait_for(pred, timeout=90):
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                if pred():
                    return True
                _time.sleep(0.5)
            return False

        assert wait_for(lambda: len(rep.state) == 20), rep.state
        t.merge_upsert(_rows(spark, [3], 1, "u1"), keys=["id"],
                       order_by=["seq"], batch_id=1, op_col="op", mode="mor")
        assert wait_for(lambda: rep.state.get(3) == (1, "u1-3")), rep.state
        t.merge_upsert(_rows(spark, [5], 2, "gone", op="delete"), keys=["id"],
                       order_by=["seq"], batch_id=2, op_col="op", mode="mor")
        assert wait_for(lambda: 5 not in rep.state), rep.state
    finally:
        q.stop()
    rep.assert_matches(t)
