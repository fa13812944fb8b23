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


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join: purchases joined to the same user's clicks
    within the preceding 10 minutes, both sides watermarked so Spark can
    bound the join state — results must match the equivalent batch join."""
    wal = synth_repo_wal(spark, 3000, n_repos=5, n_paths=10)
    # derive two event streams from the WAL (op as the type stand-in)
    write_wal_slices(wal, str(tmp_path / "wal"), 2)
    schema = spark.read.parquet(str(tmp_path / "wal") + "/slice-00000.parquet").schema

    def sides(df):
        l = df.filter(F.col("op") == "delete").select(
            F.col("repo"), F.col("seq").alias("lseq"), F.col("ts").alias("lts")
        )
        r = df.filter(F.col("op") == "upsert").select(
            F.col("repo").alias("r_repo"), F.col("seq").alias("rseq"),
            F.col("ts").alias("rts")
        )
        return l, r

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        str(tmp_path / "wal")
    )
    sl, sr = sides(stream)
    joined = (
        sl.withWatermark("lts", "10 minutes")
        .join(
            sr.withWatermark("rts", "10 minutes"),
            (F.col("repo") == F.col("r_repo"))
            & (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("rts") < F.col("lts")),
            "inner",
        )
        .select("repo", "lseq", "rseq")
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    bl, br = sides(wal)
    truth = (
        bl.join(
            br,
            (F.col("repo") == F.col("r_repo"))
            & (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("rts") < F.col("lts")),
            "inner",
        )
        .select("repo", "lseq", "rseq")
    )
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {tuple(r) for r in truth.collect()}
    assert got == want and len(want) > 0
