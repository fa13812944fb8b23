"""Multimodal plumbing: binary columns, Arrow-batched decode kernels
(stubbed codec), frame sampling fan-out."""

import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.functions.multimodal import (
    decode_audio_features,
    decode_image_features,
    resize_stub,
    sample_frames,
    synth_assets,
)


def test_decode_image_stub_raises_without_fake(spark):
    df = synth_assets(spark, 4)
    with pytest.raises(Exception) as ei:
        decode_image_features(df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_decode_image_fake_is_deterministic(spark):
    df = synth_assets(spark, 50)
    a = {r.asset_id: (r.width, r.height, r.channels, r.sha256) for r in decode_image_features(df, fake=True).collect()}
    b = {r.asset_id: (r.width, r.height, r.channels, r.sha256) for r in decode_image_features(df.repartition(7), fake=True).collect()}
    assert a == b  # partitioning must not change results
    assert len(a) == 50
    for w, h, c, sha in a.values():
        assert 64 <= w < 256 and 64 <= h < 256 and 1 <= c <= 4 and len(sha) == 64


def test_decode_audio_fake(spark):
    df = synth_assets(spark, 10, kind="audio")
    rows = decode_audio_features(df, fake=True).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.sample_rate % 8000 == 0 and 0 <= r.rms <= 1


def test_sample_frames_bounded_fanout(spark):
    df = synth_assets(spark, 5, kind="video")
    out = sample_frames(df, every_n_bytes=16, max_frames=4)
    counts = out.groupBy("asset_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in counts)
    offs = out.filter(F.col("asset_id") == 0).select("frame_offset").collect()
    assert [r[0] for r in offs] == [0, 16, 32, 48]


def test_resize_stub_records_target(spark):
    df = synth_assets(spark, 2)
    out = resize_stub(df, 224, 224).collect()
    assert all(r.target_width == 224 for r in out)
