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


def test_read_since_residual_reaches_scan(spark, table):
    """r5 found-in-verify fix, now a permanent tripwire: the read_since
    lower bound must be applied BELOW the input_file_name() ownership
    semi-join (nondeterministic — Catalyst won't push filters past it),
    so the parquet scan shows PushedFilters with the seq bound and
    row-group stats can skip inside files (laketable.py read_since)."""
    df = table.read_since(140)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(seq,140)" in plan


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
    # r5 format: {col: [lo, hi]} per file (multi-column zone maps)
    for entry in stats.values():
        assert isinstance(entry, dict) and entry
        for lohi in entry.values():
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


def reference_range(t, lo, hi, drop_deletes=True):
    return snap(
        t.to_df(drop_deletes=drop_deletes).filter(
            (F.col("seq") >= lo) & (F.col("seq") <= hi)
        )
    )


def test_read_range_equals_filtered_snapshot(spark, table):
    for lo, hi in ((-10, 10_000), (0, 50), (50, 140), (100, 151), (200, 100)):
        assert snap(table.read_range(lo, hi)) == reference_range(table, lo, hi), (lo, hi)


def test_read_range_no_stale_resurrection_under_deltas(spark, table):
    """Key 3's ORIGINAL version (seq 3) is inside [0, 100]; its LWW
    winner (seq 150, a pending MOR delta) is above. The range read must
    exclude key 3 — and because deltas are pending, the upper bound must
    have applied as a residual filter only (no file prune)."""
    assert table.current_manifest().get("deltas")
    rows = {r["id"] for r in table.read_range(0, 100).collect()}
    assert 3 not in rows
    assert table.last_read_plan["max_order"] is None  # prune disengaged
    assert table.last_read_plan["min_order"] == 0


def test_read_range_engages_prune_on_resolved_snapshot(spark, table):
    """After compaction (delta-free manifest) the upper bound ENGAGES as
    a file prune (plan records it); the fixture's compacted per-bucket
    files span the whole seq range so nothing is skippable here —
    skipping is exercised on a time-disjoint layout below."""
    table.compact()
    assert not table.current_manifest().get("deltas")
    got = snap(table.read_range(100, 130))
    plan = table.last_read_plan
    assert got == reference_range(table, 100, 130)
    assert plan["max_order"] == 130  # prune engaged
    # winner-above-bound key still excluded on the resolved path
    assert 3 not in {r["id"] for r in table.read_range(0, 100).collect()}
    # full-range window matches the plain snapshot
    assert snap(table.read_range(-1, 10_000)) == snap(table.to_df())


def test_read_range_skips_time_disjoint_files(spark, tmp_path):
    """Append-mostly shape: two COW batches of brand-new keys landing in
    DISJOINT buckets — a commit never rewrites a bucket it doesn't
    touch, so the table ends delta-free with seq-disjoint base files.
    A window over either era must scan only that era's files."""
    rows = spark.range(2000).select(
        "id",
        F.pmod(F.xxhash64(F.col("id")), F.lit(2)).cast("int").alias("b"),
    ).collect()
    era_a = [r["id"] for r in rows if r["b"] == 0][:8]
    era_b = [r["id"] for r in rows if r["b"] == 1][:8]
    assert len(era_a) == 8 and len(era_b) == 8
    t = LakeTable(spark, str(tmp_path / "eras"), num_buckets=2)
    up(t, [(i, k, "up", f"a{i}") for i, k in enumerate(era_a)], 0)  # seq 0..7
    up(t, [(100 + i, k, "up", f"b{i}") for i, k in enumerate(era_b)], 1)
    m = t.current_manifest()
    assert not m.get("deltas")
    all_files = {f for fl in m["files"].values() for f in fl}
    per_epoch = {}  # epoch dir -> file count
    for f in all_files:
        per_epoch.setdefault(f.rsplit("/", 2)[-2], set()).add(f)
    assert len(per_epoch) == 2  # era A's files survived era B's commit
    era_sizes = sorted(len(v) for v in per_epoch.values())
    for lo, hi, want_seqs in ((0, 7, set(range(8))), (100, 107, set(range(100, 108)))):
        got = snap(t.read_range(lo, hi))
        plan = t.last_read_plan
        assert got == reference_range(t, lo, hi), (lo, hi)
        assert plan["files_total"] == len(all_files)
        # only the matching era's files are scanned — the other era's
        # zone maps prove it disjoint from the window
        assert 0 < plan["files_scanned"] <= max(era_sizes), plan
        assert plan["min_order"] == lo and plan["max_order"] == hi
        assert {seq for _, seq, _ in got} == want_seqs


def test_read_range_requires_order_by(spark, tmp_path, monkeypatch):
    """A legacy manifest without ``order_by`` must reject order-bounded
    reads loudly rather than silently returning everything."""
    t = LakeTable(spark, str(tmp_path / "noorder"), num_buckets=2)
    up(t, [(1, 1, "up", "a")], 0)
    real = LakeTable.current_manifest

    def stripped(self):
        m = dict(real(self))
        m.pop("order_by", None)
        return m

    monkeypatch.setattr(LakeTable, "current_manifest", stripped)
    with pytest.raises(ValueError, match="order"):
        t.read_range(0, 10)
    with pytest.raises(ValueError, match="order"):
        t.read_since(0)


def test_stats_harvest_never_fails_commit(spark, tmp_path):
    """A footer pyarrow can't parse must not abort the commit — stats
    are prune-only metadata whose absence is defined safe."""
    bad = tmp_path / "junk.parquet"
    bad.write_bytes(b"not a parquet file at all")
    out = LakeTable._stats_of({0: str(bad)}, "seq")
    assert out == {}
