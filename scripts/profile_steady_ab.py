"""Noise-cancelled A/B of steady-state ingest configs.

Host wall-clock swings up to 4.6x here (ROUND5_NOTES), so serial runs of
two configs are not comparable. This driver bootstraps one twin table per
config in ONE Spark session, then drives the SAME tail batches through all
configs in interleaved blocks (A,B,A,B,...) — slow host windows hit every
config equally, and the per-config totals stay comparable.

Usage: python scripts/profile_steady_ab.py --configs none,auto,3200
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_500_000)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--batch-rows", type=int, default=50_000)
    ap.add_argument("--block", type=int, default=5, help="batches per interleave block")
    ap.add_argument("--mode", default="cow_incremental")
    ap.add_argument("--configs", default="none,auto",
                    help="comma list of delta_file_rows values: none|auto|<int>; "
                         "append ':seq' to force the sequential (no lineage/"
                         "write overlap) steady path for that arm")
    args = ap.parse_args()

    from tap_rest_api_msdk_spark.session import get_spark
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch
    from pyspark.sql import functions as F

    cfg_vals = []
    for c in args.configs.split(","):
        c, _, flag = c.partition(":")
        dfr = None if c == "none" else ("auto" if c == "auto" else int(c))
        cfg_vals.append((dfr, flag == "seq"))

    spark = get_spark(app_name="profile_steady_ab")
    base = tempfile.mkdtemp(prefix="steady_ab_")
    try:
        wal_path = os.path.join(base, "wal")
        synth_repo_wal(spark, args.events, shredded=True).write.mode("overwrite").parquet(wal_path)
        swal = spark.read.parquet(wal_path)
        sschema = swal.schema["payload"].dataType
        n_tail = args.batches * args.batch_rows
        n_boot = args.events - n_tail

        arms = []
        for ci, (dfr, force_seq) in enumerate(cfg_vals):
            tpath = os.path.join(base, f"tbl_{ci}")
            table = LakeTable(spark, tpath, num_buckets=64)
            conf = PipelineConfig(
                stream="st", payload_col="payload", payload_schema=sschema,
                num_buckets=64, sink_mode="cow",
            )
            process_batch(table, conf, swal.filter(F.col("seq") <= n_boot), 0)
            conf.sink_mode = args.mode
            conf.delta_file_rows = dfr
            arms.append({"dfr": dfr, "seq": force_seq, "table": table,
                         "conf": conf, "secs": 0.0, "per": []})
        print(f"bootstrapped {len(arms)} twin tables at {n_boot} events")

        for blk_start in range(0, args.batches, args.block):
            for arm in arms:
                for i in range(blk_start, min(blk_start + args.block, args.batches)):
                    lo = n_boot + i * args.batch_rows
                    b = swal.filter(
                        (F.col("seq") > lo) & (F.col("seq") <= lo + args.batch_rows))
                    if arm["seq"]:
                        arm["conf"]._steady_est = None
                    t0 = time.time()
                    process_batch(arm["table"], arm["conf"], b, i + 1)
                    dt = time.time() - t0
                    arm["secs"] += dt
                    arm["per"].append(round(dt, 3))

        print(f"mode={args.mode} {args.batches} x {args.batch_rows} rows, "
              f"interleaved blocks of {args.block}")
        for arm in arms:
            eps = n_tail / arm["secs"]
            tag = f"dfr={str(arm['dfr']):>6s}" + (":seq" if arm["seq"] else "    ")
            print(f"{tag} total {arm['secs']:6.2f}s  "
                  f"{eps:9,.0f} ev/s  per-batch {arm['per']}")
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
