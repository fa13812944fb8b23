"""Decompose one steady micro-batch's write job into its components."""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tap_rest_api_msdk_spark.session import get_spark
from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
from tap_rest_api_msdk_spark.operators.dedup import lww_dedup
from tap_rest_api_msdk_spark.functions.flatten import flatten_dataframe
from pyspark.sql import functions as F


def t(label, fn, n=3):
    best = min(timed(fn) for _ in range(n))
    print(f"{label:45s} {best:7.3f}s")
    return best


def timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    spark = get_spark(app_name="profile_parts", cores=32)
    base = tempfile.mkdtemp(prefix="steady_parts_")
    try:
        wal = os.path.join(base, "wal")
        synth_repo_wal(spark, 1_200_000, shredded=True).write.mode("overwrite").parquet(wal)
        swal = spark.read.parquet(wal)
        lo = 1_000_000
        b = swal.filter((F.col("seq") > lo) & (F.col("seq") <= lo + 20_000))

        t("scan+count batch slice", lambda: b.count())
        shaped = flatten_dataframe(b.drop("payload"), b.select("payload.*"), prefix="") \
            if False else None
        # use the pipeline's own prepare path shape: flatten struct payload
        from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, prepare_batch
        conf = PipelineConfig(stream="st", payload_col="payload",
                              payload_schema=swal.schema["payload"].dataType,
                              num_buckets=64, sink_mode="cow_incremental")
        shaped = prepare_batch(b, conf, None)
        shaped = shaped.withColumn(
            "__bucket",
            F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(64)).cast("int"))
        t("flatten+count", lambda: shaped.count())
        winners = lww_dedup(shaped, ["repo", "path", "__bucket"], ["seq", "commit"])
        t("flatten+lww+count", lambda: winners.count())
        for k in (64, 16, 4):
            out = os.path.join(base, f"w{k}")
            salt = F.pmod(F.xxhash64("repo", "path", F.lit("__salt__")), F.lit(1)).cast("int")
            def w(k=k, out=out):
                shutil.rmtree(out, ignore_errors=True)
                (winners.withColumn("__salt", salt)
                 .repartition(k, "__bucket", "__salt").drop("__salt")
                 .write.mode("overwrite").parquet(out))
            t(f"lww+repartition({k})+write", w)
        # driver-side footer stats on the 64-file output
        out = os.path.join(base, "w64")
        files = [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")]
        from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
        tbl = LakeTable(spark, os.path.join(base, "tbl"), num_buckets=64)
        by_index = {i: f for i, f in enumerate(sorted(files))}
        t("_stats_of 64 footers (driver)", lambda: tbl._stats_of(by_index, ["seq"]))
        t("_sizes_of 64 files (driver)", lambda: tbl._sizes_of(by_index))
        # metrics job
        from tap_rest_api_msdk_spark.streaming.metrics import lineage_metrics
        src = b.withColumn("__p", F.pmod(F.xxhash64("repo", "path"), F.lit(64)).cast("int"))
        m = lineage_metrics(src, "__p", "seq", ts_col="ts", bytes_col=None)
        t("lineage_metrics collect", lambda: m.collect())
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
