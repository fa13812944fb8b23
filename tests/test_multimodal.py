"""Multimodal plumbing: binary columns, Arrow-batched decode kernels with
REAL stdlib codecs (PPM / WAV / FAKV container), frame sampling fan-out."""

import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.functions.multimodal import (
    _synth_audio,
    _synth_image,
    decode_audio_features,
    decode_image_features,
    resize_stub,
    sample_frames,
    synth_assets,
)


def test_decode_image_raises_on_unknown_codec(spark):
    """Non-PPM magic (e.g. JPEG) -> NotImplementedError: codec honesty."""
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"\xff\xd8\xff\xe0JFIF-not-decodable"), None)],
        "asset_id long, kind string, data binary, meta map<string,string>",
    )
    with pytest.raises(Exception) as ei:
        decode_image_features(df).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_decode_image_real_ppm(spark):
    """The decoder parses REAL P6 headers/pixels: dims and pixel sums match
    the generation formulas and are partition-invariant."""
    df = synth_assets(spark, 50)
    a = {r.asset_id: (r.width, r.height, r.channels, r.n_bytes, r.pixel_sum)
         for r in decode_image_features(df).collect()}
    b = {r.asset_id: (r.width, r.height, r.channels, r.n_bytes, r.pixel_sum)
         for r in decode_image_features(df.repartition(7)).collect()}
    assert a == b  # partitioning must not change results
    assert len(a) == 50
    for aid, (w, h, c, nb, psum) in a.items():
        assert w == 8 + (aid * 7) % 24 and h == 8 + (aid * 11) % 24 and c == 3
        assert nb == len(_synth_image(aid))
        assert psum == sum((aid * 31 + k * 17) % 256 for k in range(w * h * 3))


def test_decode_audio_real_wav(spark):
    df = synth_assets(spark, 10, kind="audio")
    rows = decode_audio_features(df).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.sample_rate == 8000 * (1 + r.asset_id % 6)
        assert r.n_samples == 256 + (r.asset_id * 13) % 256
        assert r.n_bytes == len(_synth_audio(r.asset_id))
        assert 0 < r.rms < 2048


def test_sample_frames_reads_real_bytes(spark):
    df = synth_assets(spark, 5, kind="video")
    out = sample_frames(df, every_n_bytes=16, max_frames=4)
    counts = out.groupBy("asset_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in counts)
    rows = out.filter(F.col("asset_id") == 3).orderBy("frame_idx").collect()
    assert [r.frame_offset for r in rows] == [0, 16, 32, 48]
    assert all(r.frame_byte == (3 * 31 + r.frame_offset * 17) % 256 for r in rows)


def test_resize_stub_records_target(spark):
    df = synth_assets(spark, 2)
    out = resize_stub(df, 224, 224).collect()
    assert all(r.target_width == 224 for r in out)


def test_png_roundtrip_all_filter_types():
    """Synthetic PNGs cycle filter type per row (None/Sub/Up/Average/
    Paeth); decode must recover the closed-form pixel plane exactly."""
    import numpy as np

    from tap_rest_api_msdk_spark.functions.multimodal import _decode_png, _synth_png

    for aid in (0, 1, 7, 23, 101):
        w, h, ch, psum = _decode_png(_synth_png(aid))
        ew, eh = 8 + (aid * 7) % 24, 8 + (aid * 11) % 24
        k = np.arange(ew * eh * 3, dtype=np.int64)
        assert (w, h, ch) == (ew, eh, 3)
        assert psum == int(((aid * 31 + k * 17) % 256).sum())


def test_png_unsupported_layout_raises():
    import struct
    import zlib

    import pytest

    from tap_rest_api_msdk_spark.functions.multimodal import _PNG_SIG, _decode_png

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    # 16-bit grayscale: valid PNG, unsupported layout
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    blob = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="PNG layout"):
        _decode_png(blob)


def test_png_decode_through_spark(spark):
    from pyspark.sql import functions as F

    from tap_rest_api_msdk_spark.functions.multimodal import (
        decode_image_features,
        synth_assets,
    )

    out = decode_image_features(synth_assets(spark, 50, kind="png"))
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 50
    import numpy as np

    for aid in (0, 13, 49):
        r = rows[aid]
        k = np.arange(r["width"] * r["height"] * 3, dtype=np.int64)
        assert r["pixel_sum"] == int(((aid * 31 + k * 17) % 256).sum())
