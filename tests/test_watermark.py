"""Watermarked windowed aggregation over the streaming WAL (§2.5 streaming
rows: watermarks bound state; late events beyond the delay are dropped)."""

import os

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal, write_wal_slices


def test_watermarked_tumbling_window_stream(spark, tmp_path):
    wal = synth_repo_wal(spark, 2000, n_repos=5, n_paths=10)
    slices = write_wal_slices(wal, str(tmp_path / "wal"), 2)
    schema = spark.read.parquet(slices[0]).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "wal"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "lang", "n")
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")  # append requires the watermark: state is bounded
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    # windows older than (max ts - 10min) were finalized and emitted;
    # totals over emitted windows match the batch truth for those windows
    truth = (
        wal.groupBy(F.window("ts", "5 minutes").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "lang", "n")
    )
    emitted = got.join(truth, ["window_start", "lang"], "left")
    assert emitted.count() > 0
    mismatch = emitted.filter(got["n"] != truth["n"]).count()
    assert mismatch == 0


def test_dedup_within_watermark_stream(spark, tmp_path):
    """Streaming exact-once dedup bounded by a watermark:
    dropDuplicatesWithinWatermark keeps the first delivery of each event id
    while holding only watermark-deep state — the streaming analog of the
    batch exact-dedup, with bounded memory at 100 TB."""
    wal = synth_repo_wal(spark, 1000, n_repos=5, n_paths=10)
    # duplicate every event (simulated at-least-once source), same ts
    dup = wal.union(wal)
    slices = write_wal_slices(dup, str(tmp_path / "wal"), 2)
    schema = spark.read.parquet(slices[0]).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "wal"))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(["seq"])
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    # every seq exactly once (duplicates arrive within the watermark)
    assert got.count() == got.select("seq").distinct().count()
    assert got.select("seq").distinct().count() == 1000
