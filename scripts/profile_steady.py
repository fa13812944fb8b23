"""Profile the steady-state micro-batch ingest path (bench `steady_*` leg).

Reproduces the bench shape at a configurable scale — bootstrap most of a
shredded WAL into a 64-bucket table, then drive N small batches through
``process_batch`` — and reports (a) per-batch wall time, (b) a cProfile
cumulative breakdown of the steady loop so per-batch overhead (Spark job
count, manifest IO, driver-side python) is attributed, not guessed.

Usage: python scripts/profile_steady.py [--events 1200000] [--batches 10]
       [--mode cow_incremental] [--cores 32]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_200_000)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--batch-rows", type=int, default=20_000)
    ap.add_argument("--mode", default="cow_incremental")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--profile", action="store_true", help="cProfile the steady loop")
    ap.add_argument(
        "--delta-file-rows", default="default",
        help="'default' keeps the PipelineConfig default ('auto'); "
             "'none' forces uncapped; an int sets rows/file")
    args = ap.parse_args()

    from tap_rest_api_msdk_spark.session import get_spark
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile_steady", cores=args.cores)
    base = tempfile.mkdtemp(prefix="steady_prof_")
    try:
        wal_path = os.path.join(base, "wal")
        synth_repo_wal(spark, args.events, shredded=True).write.mode("overwrite").parquet(wal_path)
        swal = spark.read.parquet(wal_path)
        sschema = swal.schema["payload"].dataType

        n_tail = args.batches * args.batch_rows
        n_boot = args.events - n_tail
        tpath = os.path.join(base, "tbl")
        table = LakeTable(spark, tpath, num_buckets=args.buckets)
        conf = PipelineConfig(
            stream="st", payload_col="payload", payload_schema=sschema,
            num_buckets=args.buckets, sink_mode="cow",
        )
        t0 = time.time()
        process_batch(table, conf, swal.filter(F.col("seq") <= n_boot), 0)
        print(f"bootstrap {n_boot} events in {time.time()-t0:.1f}s")
        conf.sink_mode = args.mode
        if args.delta_file_rows != "default":
            conf.delta_file_rows = (
                None if args.delta_file_rows == "none" else int(args.delta_file_rows)
            )

        batches = [
            swal.filter(
                (F.col("seq") > n_boot + i * args.batch_rows)
                & (F.col("seq") <= n_boot + (i + 1) * args.batch_rows)
            )
            for i in range(args.batches)
        ]

        per_batch = []

        def steady():
            for i, b in enumerate(batches):
                tb = time.time()
                process_batch(table, conf, b, i + 1)
                per_batch.append(time.time() - tb)

        if args.profile:
            pr = cProfile.Profile()
            t0 = time.time()
            pr.runcall(steady)
            wall = time.time() - t0
            s = io.StringIO()
            ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
            ps.print_stats(40)
            print(s.getvalue())
        else:
            t0 = time.time()
            steady()
            wall = time.time() - t0

        print(f"mode={args.mode} batches={args.batches} x {args.batch_rows} rows")
        print("per-batch sec:", [round(x, 3) for x in per_batch])
        print(f"steady wall {wall:.2f}s -> {n_tail / wall:,.0f} events/sec")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
