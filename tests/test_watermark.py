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
