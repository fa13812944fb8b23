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
    rep.fail_next = True
    try:
        stream_net_changes(t, rep.apply, ckpt)
        raise AssertionError("expected the injected sink crash to surface")
    except Exception:
        pass
    # restart with the same checkpoint: the SAME window is re-presented
    before = [w for _, w in rep.windows]
    stream_net_changes(t, rep.apply, ckpt)
    after = [w for _, w in rep.windows]
    assert len(after) == len(before) + 1
    rep.assert_matches(t)


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
