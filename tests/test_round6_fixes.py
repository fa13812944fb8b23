"""Regression guards for the round-5 VERDICT / ADVICE findings fixed in r6.

1. similarity broadcast memoization: the plane/centroid TorrentBroadcasts
   are created ONCE per (app, matrix) and reused across invocations —
   broadcast blocks no longer accumulate in a long-lived session; an
   explicit release hook unpersists the cache.
2. driver-gate rotation is mechanical: queries() orders the registry
   stalest-first from the CORRECTNESS_r*.json history, so the driver's
   50-entry cap alternates coverage by construction (no hand-edited list).
3. tmpfs spill default checks /dev/shm free headroom before adopting it
   (ADVICE medium: a half-full small tmpfs must not become the spill dir).
"""

from __future__ import annotations

import numpy as np
import pytest

from tap_rest_api_msdk_spark.functions import similarity as sim


@pytest.fixture()
def emb(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_plane_broadcast_memoized_and_released(spark, emb):
    sim.release_broadcasts()
    tables = [sim._md5_hyperplanes(8, 4, t) for t in range(3)]
    out1 = sim._portable_buckets_np(emb, tables, "vec_id", "vec_id", "embedding").collect()
    assert len(sim._BC_CACHE) == 1
    bc_first = next(iter(sim._BC_CACHE.values()))
    out2 = sim._portable_buckets_np(emb, tables, "vec_id", "vec_id", "embedding").collect()
    # second call reused the SAME broadcast handle — no new block
    assert len(sim._BC_CACHE) == 1
    assert next(iter(sim._BC_CACHE.values())) is bc_first
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    # a different matrix gets its own entry; release drops both
    tables2 = [sim._md5_hyperplanes(8, 4, t) for t in range(2)]
    sim._portable_buckets_np(emb, tables2, "vec_id", "vec_id", "embedding").collect()
    assert len(sim._BC_CACHE) == 2
    assert sim.release_broadcasts() == 2
    assert sim._BC_CACHE == {}


def test_centroid_broadcast_memoized(spark, emb):
    sim.release_broadcasts()
    cents = np.asarray(
        [[(c * 13 + j) % 7 - 3 for j in range(8)] for c in range(4)], dtype=np.int64
    )
    out1 = sim._ivf_assign_np(emb, cents, 2, "vec_id", "vec_id", "embedding").collect()
    out2 = sim._ivf_assign_np(emb, cents, 2, "vec_id", "vec_id", "embedding").collect()
    assert len(sim._BC_CACHE) == 1
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    sim.release_broadcasts()


def test_driver_rotation_is_stalest_first(tmp_path, monkeypatch):
    import __spark_entry__ as entry_mod

    def fake_seen():
        return {"b": 5, "c": 4}  # 'a' never driver-verified, 'c' stalest seen

    monkeypatch.setattr(entry_mod, "_driver_last_seen", fake_seen)
    rotated = entry_mod._rotate_for_driver({"a": 1, "b": 2, "c": 3, "d": 4})
    # never-seen (a, d — registry order) lead, then last-seen ascending
    assert list(rotated) == ["a", "d", "c", "b"]


def test_driver_rotation_live_covers_previously_uncovered():
    """With the real artifact history, the first 50 registry entries must
    include every query the LAST round's driver artifact missed."""
    import glob
    import json
    import re

    import __spark_entry__ as entry_mod

    paths = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not paths:
        pytest.skip("no driver artifacts yet")
    last = json.load(open(paths[-1]))
    qs = list(entry_mod.queries())
    uncovered = [k for k in qs if k not in last]
    assert set(uncovered) <= set(qs[:50])
    # sanity: the rotation never drops or duplicates entries
    assert sorted(qs) == sorted(set(qs)) and len(qs) >= 75


def test_tmpfs_default_respects_free_space(monkeypatch):
    from tap_rest_api_msdk_spark import session as sess

    monkeypatch.setenv("SPARK_GRAFT_TMPFS_MIN_GB", "1e9")  # absurd threshold
    assert sess._default_tmpfs_dir() is None
    monkeypatch.setenv("SPARK_GRAFT_TMPFS_MIN_GB", "0")
    import os

    expected = "/dev/shm/spark-graft-local" if os.path.isdir("/dev/shm") else None
    assert sess._default_tmpfs_dir() == expected


def test_df_debugging_default_off_with_env_escape(spark, monkeypatch):
    # Session default: call-site capture disabled (95ms/plan driver cost in
    # the steady micro-batch loop); SPARK_GRAFT_DF_DEBUG=1 restores it.
    # The live session fixture was built without the env var:
    assert (
        spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    )
    # The builder resolves the env var at build time (static conf).
    from tap_rest_api_msdk_spark import session as sess
    import inspect

    src = inspect.getsource(sess.get_spark)
    assert "SPARK_GRAFT_DF_DEBUG" in src
