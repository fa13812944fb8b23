"""Round-3 hardening: fault-tolerant iterative checkpointing, the
overflow-proof convergence detector, auto-sized index granularity, and
the ADVICE parity fixes (auth precedence, no_auth, WAV layout raise,
asof tie_break validation, jsonpath exponent literals, conf-parse guard).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# connected_components: reliable checkpoint + chaos + overflow
# ---------------------------------------------------------------------------

def _chain_pairs(spark, chains):
    rows = []
    for chain in chains:
        rows += [(a, b) for a, b in zip(chain, chain[1:])]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_reliable_checkpoint_survives_block_loss(spark, tmp_path):
    """With a checkpoint dir set, per-round state lives in FILES: dropping
    every cached block mid-loop (the executor-loss analog local mode can
    express) must not change the result. localCheckpoint would die here —
    its blocks ARE the data."""
    from tap_rest_api_msdk_spark.operators.neardup import connected_components

    sc = spark.sparkContext
    old_dir = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        chains = [list(range(i * 100, i * 100 + 6)) for i in range(5)]
        pairs = _chain_pairs(spark, chains)

        def drop_all_blocks(i, labels):
            # invalidate every cached block: catalog cache plus every
            # persisted RDD registered with the context
            spark.catalog.clearCache()
            jsc = sc._jsc.sc()
            for rdd_id in [r.id() for r in jsc.getRDDStorageInfo()]:
                sc._jvm.org.apache.spark.SparkEnv.get().blockManager().master().removeRdd(
                    rdd_id, True
                )

        got = {
            r.node: r.comp
            for r in connected_components(
                pairs, checkpoint="reliable", _round_hook=drop_all_blocks
            ).collect()
        }
        for chain in chains:
            for n in chain:
                assert got[n] == chain[0]
    finally:
        if old_dir:
            sc.setCheckpointDir(old_dir)


def test_auto_mode_picks_reliable_when_dir_set(spark, tmp_path):
    from tap_rest_api_msdk_spark.operators.neardup import _iter_checkpoint

    sc = spark.sparkContext
    old_dir = sc.getCheckpointDir()
    sc.setCheckpointDir(str(tmp_path / "ckpt2"))
    try:
        df = _iter_checkpoint(spark.range(10), "auto")
        assert df.count() == 10
        # reliable checkpoints materialize files under the checkpoint dir
        import os

        found = any(files for _, _, files in os.walk(str(tmp_path / "ckpt2")))
        assert found, "auto mode with a checkpoint dir must write reliable files"
    finally:
        if old_dir:
            sc.setCheckpointDir(old_dir)


def test_convergence_sum_no_int64_wrap_early_exit(spark):
    """Regression: 4 four-node chains whose round-1 label-sum delta is
    exactly 2^64 (accounting for the min-neighbor label seeding) — an
    int64 sum wraps to the SAME value and a long-typed detector would
    exit one round early, leaving the chain tails mislabeled. The
    decimal(38,0) detector must keep iterating to the true fixpoint."""
    from tap_rest_api_msdk_spark.operators.neardup import connected_components

    chains = [
        [i, (1 << 61) + i, (1 << 62) + i, (1 << 62) + (1 << 61) + i]
        for i in range(4)
    ]
    pairs = _chain_pairs(spark, chains)
    got = {r.node: r.comp for r in connected_components(pairs, checkpoint="local").collect()}
    for chain in chains:
        for n in chain:
            assert got[n] == chain[0], f"node {n} labeled {got[n]}, want {chain[0]}"


def test_loop_shuffle_width_non_numeric_conf():
    """Deployments (e.g. Databricks AQE) surface 'auto' for the shuffle
    width; Spark 4 local sessions refuse to SET a non-int, so exercise the
    guard with a stub session shaped like those deployments."""
    from tap_rest_api_msdk_spark.operators.neardup import _loop_shuffle_width

    class _Conf:
        def get(self, key):
            return "auto"

    class _SC:
        defaultParallelism = 8

    class _Spark:
        conf = _Conf()
        sparkContext = _SC()

    assert _loop_shuffle_width(_Spark()) == 8

    class _SCBoom:
        @property
        def defaultParallelism(self):
            raise RuntimeError("Spark Connect: no sparkContext")

    class _SparkConnect:
        conf = _Conf()
        sparkContext = _SCBoom()

    assert _loop_shuffle_width(_SparkConnect()) == 16


# ---------------------------------------------------------------------------
# auto-sized index granularity
# ---------------------------------------------------------------------------

def test_auto_centroids_sqrt_rule():
    from tap_rest_api_msdk_spark.functions.similarity import auto_centroids

    assert auto_centroids(0) == 16
    assert auto_centroids(100) == 16
    assert auto_centroids(10_000) == 100
    assert auto_centroids(10_001) == 101
    # per-cluster candidate list ~ n/C stays ~sqrt(n): a 100x corpus only
    # grows expected cluster size 10x, not 100x
    n1, n2 = 1_000_000, 100_000_000
    assert (n2 / auto_centroids(n2)) / (n1 / auto_centroids(n1)) == pytest.approx(10, rel=0.01)


def test_ivf_auto_c_matches_pinned_c(spark):
    """n_centroids=None must equal an explicit C=ceil(sqrt(n)) run."""
    import math

    from tap_rest_api_msdk_spark.functions.similarity import ivf_topk_portable

    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    c = max(16, math.ceil(math.sqrt(400)))
    a = ivf_topk_portable(emb, q, k=5, n_centroids=None).collect()
    b = ivf_topk_portable(emb, q, k=5, n_centroids=c).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert c == 20  # the auto rule actually scaled past the floor


# ---------------------------------------------------------------------------
# ADVICE parity fixes
# ---------------------------------------------------------------------------

def test_auth_tap_config_wins_wholesale():
    """Reference auth.py:220-223 picks the TAP config whenever present —
    per-key merging is NOT the reference's behavior."""
    from tap_rest_api_msdk_spark.config import resolve_streams

    cfg = {
        "api_url": "https://x",
        "auth_method": "basic",
        "username": "tapuser",
        "password": "tappw",
        "streams": [
            {"name": "s1", "path": "/a", "auth_method": "bearer_token", "bearer_token": "t"},
        ],
    }
    (s1,) = resolve_streams(cfg)
    assert s1.auth["auth_method"] == "basic"
    assert s1.auth["username"] == "tapuser"
    assert "bearer_token" not in s1.auth  # no per-key merge


def test_auth_stream_used_when_tap_has_none():
    from tap_rest_api_msdk_spark.config import resolve_streams

    cfg = {
        "api_url": "https://x",
        "streams": [{"name": "s1", "path": "/a", "auth_method": "basic",
                     "username": "u", "password": "p"}],
    }
    (s1,) = resolve_streams(cfg)
    assert s1.auth["auth_method"] == "basic"


def test_no_auth_returns_none():
    from tap_rest_api_msdk_spark.config import validate_auth

    assert validate_auth({"auth_method": "no_auth", "username": "u"}) is None


def test_wav_bad_layout_raises_not_implemented(spark):
    import struct

    from tap_rest_api_msdk_spark.functions.multimodal import decode_audio_features

    # stereo 16-bit RIFF: valid container, unsupported layout
    hdr = b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE" + b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16
    ) + b"data" + struct.pack("<I", 8) + b"\0" * 8
    df = spark.createDataFrame([(1, "audio", bytearray(hdr))], "asset_id long, kind string, data binary")
    with pytest.raises(Exception) as ei:
        decode_audio_features(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_asof_tie_break_not_carried_raises(spark):
    from tap_rest_api_msdk_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 5, 7, "x")], "k long, ts long, ver long, val string")
    with pytest.raises(ValueError, match="tie_break"):
        asof_join(left, right, keys=["k"], ts_col="ts", right_cols=["val"], tie_break="ver")


def test_jsonpath_exponent_literal():
    from tap_rest_api_msdk_spark.plans.jsonpath import find_all

    doc = {"items": [{"n": 100000.0, "v": "a"}, {"n": 3.0, "v": "b"}]}
    assert find_all("$.items[?(@.n==1e5)].v", doc) == ["a"]


def test_jsonpath_bad_literal_is_parse_error():
    from tap_rest_api_msdk_spark.plans.jsonpath import find_all

    with pytest.raises(ValueError, match="jsonpath"):
        find_all("$.items[?(@.n==1e5x)].v", {"items": []})


def test_infer_json_schema_all_paths_agree(spark, tmp_path):
    """The Connect-safe spill path must infer the same schema as the
    JVM-native and RDD paths, and clean its temp dir up."""
    import os

    from tap_rest_api_msdk_spark.streaming.pipeline import infer_json_schema_full

    rows = [('{"a": 1, "b": {"c": "x"}}',), ('{"a": 2, "d": [1,2]}',), (None,)]
    payloads = spark.createDataFrame(rows, "value string")
    spill = str(tmp_path / "spill")
    s_jvm = infer_json_schema_full(payloads, spill, attempts=("jvm",))
    s_rdd = infer_json_schema_full(payloads, spill, attempts=("rdd",))
    s_spl = infer_json_schema_full(payloads, spill, attempts=("spill",))
    assert s_jvm == s_rdd == s_spl
    assert not os.path.exists(spill)


def test_infer_json_schema_falls_through_to_spill(spark, tmp_path):
    from tap_rest_api_msdk_spark.streaming.pipeline import infer_json_schema_full

    payloads = spark.createDataFrame([('{"a": 1}',)], "value string")
    # unknown attempt names raise nothing and fall through; only spill runs
    s = infer_json_schema_full(payloads, str(tmp_path / "s"), attempts=("spill",))
    assert [f.name for f in s.fields] == ["a"]
