"""Zone maps (``file_stats``): per-file [min, max] of the LWW ordering
column harvested from parquet footers at write time, and the
``read_since`` pruned read built on them — file skipping must be
invisible to results (prune-only metadata) and must actually skip cold
files on append-mostly histories.
"""

import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.streaming.laketable import LakeTable

SCHEMA = "seq long, id long, op string, val string"


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def up(t, rows, bid, **kw):
    return t.merge_upsert(
        mk(t.spark, rows), keys=["id"], order_by=["seq"], batch_id=bid,
        op_col="op", **kw
    )


def snap(df):
    return sorted((r["id"], r["seq"], r["val"]) for r in df.collect())


def reference_since(t, lo, drop_deletes=True):
    return snap(t.to_df(drop_deletes=drop_deletes).filter(F.col("seq") >= lo))


@pytest.fixture()
def table(spark, tmp_path):
    """Mixed history: COW base, MOR deltas, cross-bound updates, a
    tombstone after the bound and one before it."""
    t = LakeTable(spark, str(tmp_path / "lake"), num_buckets=4)
    up(t, [(i, i, "up", f"v{i}") for i in range(100)], 0)          # seq 0..99
    up(t, [(100 + i, 200 + i, "up", f"m{i}") for i in range(20)], 1, mode="mor")
    # key 3 updated late (winner above any mid bound), key 5 deleted late,
    # key 7 deleted EARLY (seq 8, winner below mid bounds)
    up(t, [(150, 3, "up", "late3"), (151, 5, "delete", None)], 2, mode="mor")
    up(t, [(8, 7, "delete", None)], 3)  # loses LWW to nothing (seq 7 < 8): tombstone wins
    return t


def test_read_since_equals_filtered_snapshot(spark, table):
    for lo in (-10, 0, 50, 100, 140, 151, 10_000):
        assert snap(table.read_since(lo)) == reference_since(table, lo), lo
    # tombstones surface when asked for
    got = sorted(
        (r["id"], r["seq"]) for r in table.read_since(140, drop_deletes=False).collect()
    )
    want = sorted(
        (r["id"], r["seq"])
        for r in table.to_df(drop_deletes=False).filter("seq >= 140").collect()
    )
    assert got == want and (5, 151) in got


def test_late_winner_kept_early_winner_excluded(spark, table):
    rows = {r["id"]: r["seq"] for r in table.read_since(140).collect()}
    assert rows[3] == 150          # cross-bound update resolves to the winner
    assert 5 not in rows           # late tombstone not resurrected
    assert 7 not in rows           # early-history key entirely below bound


def test_pruning_skips_cold_files_and_accounts(spark, table):
    table.read_since(10_000)
    plan = table.last_read_plan
    assert plan["files_total"] > 0
    assert plan["files_scanned"] < plan["files_total"], plan
    # a bound below every row scans everything
    assert snap(table.read_since(-1)) == reference_since(table, -1)
    full = table.last_read_plan
    assert full["files_scanned"] == full["files_total"]
    # monotone: higher bound never scans more files
    table.read_since(151)
    hi = table.last_read_plan
    table.read_since(50)
    mid = table.last_read_plan
    assert hi["files_scanned"] <= mid["files_scanned"] <= full["files_scanned"]
    assert hi["files_scanned"] < full["files_total"]


def test_stats_written_and_pruned_to_live_set(spark, table):
    m = table.current_manifest()
    stats = m.get("file_stats", {})
    live = {
        f.rsplit("/", 1)[-1]
        for sec in ("files", "deltas")
        for fl in m.get(sec, {}).values()
        for f in fl
    }
    assert stats and set(stats) <= live
    for lohi in stats.values():
        assert len(lohi) == 2 and lohi[0] <= lohi[1]


def test_files_without_stats_are_never_skipped(spark, tmp_path, monkeypatch):
    t = LakeTable(spark, str(tmp_path / "nostats"), num_buckets=2)
    monkeypatch.setattr(LakeTable, "_stats_of", staticmethod(lambda bi, col: {}))
    up(t, [(i, i, "up", f"v{i}") for i in range(40)], 0)
    up(t, [(100, 50, "up", "new")], 1, mode="mor")
    monkeypatch.undo()
    assert not t.current_manifest().get("file_stats")
    assert snap(t.read_since(90)) == reference_since(t, 90)
    plan = t.last_read_plan
    assert plan["files_scanned"] == plan["files_total"]  # prune-only: no stats, no skips


def test_stats_survive_maintenance(spark, table):
    for step in (
        lambda: table.fold_due(),
        lambda: table.compact(),
        lambda: table.rebucket(8),
        lambda: table.vacuum(retain_last=1),
    ):
        step()
        m = table.current_manifest()
        stats = m.get("file_stats", {})
        live = {
            f.rsplit("/", 1)[-1]
            for sec in ("files", "deltas")
            for fl in m.get(sec, {}).values()
            for f in fl
        }
        assert set(stats) <= live
        for lo in (0, 100, 151):
            assert snap(table.read_since(lo)) == reference_since(table, lo), lo
    # post-compact/rebucket the files were rewritten — stats re-harvested
    assert table.current_manifest().get("file_stats")


def test_time_travel_read_since(spark, table):
    v = table.current_manifest()["version"]
    before = snap(table.read_since(100))
    up(table, [(500, 999, "up", "later")], 4)
    assert snap(table.read_since(100, version=v)) == before
    assert (999, 500, "later") in snap(table.read_since(100))


def test_single_manifest_load_per_read(spark, table, monkeypatch):
    """to_df / read_since decide file listing, dedup, residual and
    tombstone filters off ONE manifest load — a commit landing between
    two loads must not be able to tear the read."""
    calls = {"n": 0}
    real = LakeTable.current_manifest

    def counting(self):
        calls["n"] += 1
        return real(self)

    monkeypatch.setattr(LakeTable, "current_manifest", counting)
    table.read_since(100)
    assert calls["n"] == 1, calls
    calls["n"] = 0
    table.to_df()
    assert calls["n"] == 1, calls


def test_stats_harvest_never_fails_commit(spark, tmp_path):
    """A footer pyarrow can't parse must not abort the commit — stats
    are prune-only metadata whose absence is defined safe."""
    bad = tmp_path / "junk.parquet"
    bad.write_bytes(b"not a parquet file at all")
    out = LakeTable._stats_of({0: str(bad)}, "seq")
    assert out == {}
