"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata — the lake
table treats them like any other payload. The Spark-side machinery here is
REAL and tested: schemas, Arrow-batched ``mapInPandas`` kernels, batch
shapes, partition sizing. The codec step itself is STUBBED (this container
ships no image/audio libraries): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic metadata extractor so the distributed plumbing can be
exercised end-to-end.

Design notes for 100 TB media:
- binary payloads dominate partition size: repartition by
  ``bytes``-aware ranges (``maxPartitionBytes`` downwards) before decode
- decode is embarrassingly parallel: ``mapInPandas`` streams Arrow record
  batches — memory bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
- frame sampling (video) multiplies rows: explode AFTER the filter that
  selects assets, never before.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, kind string, n_bytes long, sha256 string, width int, height int, channels int"
)

AUDIO_FEATURES_SCHEMA = (
    "asset_id long, kind string, n_bytes long, sha256 string, sample_rate int, n_samples long, rms double"
)


def _fake_dims(data: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dims derived from content hash."""
    h = hashlib.sha256(data).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4


def synth_assets(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic binary assets for tests (content = seeded hash bytes)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.lit(kind).alias("kind"),
            F.sha2(F.col("id").cast("string"), 512).cast("binary").alias("data"),
            F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
        )
    )


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched image decode -> feature rows.

    Real codec work happens where the ``NotImplementedError`` is raised;
    everything around it (batching, schema, partitioning) is production
    plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this container; pass fake=True "
                    "to exercise the plumbing with a deterministic stub"
                )
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                w, h, c = _fake_dims(blob)
                rows.append(
                    (int(aid), kind, len(blob), hashlib.sha256(blob).hexdigest(), w, h, c)
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "n_bytes", "sha256", "width", "height", "channels"],
            )

    return df.select("asset_id", "kind", "data").mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def decode_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio codec not available in this container; pass fake=True"
                )
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                h = hashlib.sha256(blob).digest()
                rows.append(
                    (
                        int(aid),
                        kind,
                        len(blob),
                        hashlib.sha256(blob).hexdigest(),
                        8000 * (1 + h[3] % 6),
                        int.from_bytes(h[4:6], "big"),
                        round(h[6] / 255.0, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "n_bytes", "sha256", "sample_rate", "n_samples", "rms"],
            )

    return df.select("asset_id", "kind", "data").mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 16, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled "frame".

    With no video codec, a frame = a byte-slice index; the real decoder
    would replace ``frame_offset`` computation with PTS-based sampling.
    The plan shape (explode AFTER filter, bounded fan-out) is the real
    thing being tested.
    """
    n_frames = F.least(
        F.floor(F.length("data") / F.lit(every_n_bytes)).cast("int"), F.lit(max_frames)
    )
    return (
        df.withColumn(
            "frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
        )
        .withColumn("frame_offset", F.col("frame_idx") * every_n_bytes)
        .select("asset_id", "kind", "frame_idx", "frame_offset")
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes through with target dims recorded; the codec
    hook raises if actually asked to transform pixels."""
    return df.withColumn("target_width", F.lit(width)).withColumn(
        "target_height", F.lit(height)
    )
