#!/usr/bin/env python
"""One CDC-replay scaling leg in a FRESH JVM (its own process).

Usage: python scripts/scaling_leg.py WAL_PATH MASTER OUT_DIR

MASTER is any Spark master string — the bench uses ``local-cluster[W,C,M]``
(real separate executor JVMs + RPC shuffle: the faithful single-box proxy
for an N-executor cluster) and ``local[N]`` (thread mode, kept for
cross-round continuity with BENCH/BASELINE.md's original pair).

Env:
  LEG_REPEATS   replay repetitions (default 2; first run warms JIT/python
                workers — report min)
  LEG_FPB       files_per_bucket for the merge (default 4: 64 buckets x 4
                salt slices = 256 write tasks, >=4 waves on 32 cores so the
                Zipf-hot buckets cannot straggle a 2-wave schedule)
  LEG_EXEC_MEM  executor memory (default 10g)

Prints ONE JSON line: {"master": ..., "times": [...], "best": ...}.
The WAL's payload schema must sit next to it as <wal>.schema.json
(written by the bench; avoids an inference pass inside the timed leg).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    wal_path, master, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
    repeats = int(os.environ.get("LEG_REPEATS", "2"))
    fpb = int(os.environ.get("LEG_FPB", "4"))

    from pyspark.sql import SparkSession
    from pyspark.sql import types as T

    shm = "/dev/shm/spark-graft-local" if os.path.isdir("/dev/shm") else None
    builder = (
        SparkSession.builder.appName("scaling-leg").master(master)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", os.environ.get("LEG_EXEC_MEM", "10g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if shm:
        builder = builder.config("spark.local.dir", shm)
    # env-gated stage-metrics capture (r7, verdict item #1): when
    # LEG_EVENTLOG_DIR is set, write the Spark event log so
    # scripts/scaling_attrib.py can aggregate per-stage shuffle bytes,
    # CPU/GC time and spill for the executor-scaling pair. Off (and
    # byte-identical behavior) when unset — the bench never sets it.
    ev_dir = os.environ.get("LEG_EVENTLOG_DIR")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", "file://" + ev_dir)
            .config("spark.eventLog.compress", "false")
        )
    s = builder.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    from tap_rest_api_msdk_spark.streaming.pipeline import (
        PipelineConfig,
        run_batch_replay,
    )

    wal_df = s.read.parquet(wal_path)
    with open(wal_path + ".schema.json") as fh:
        payload_schema = T._parse_datatype_json_string(fh.read())

    times = []
    for i in range(repeats):
        tdir = os.path.join(outdir, f"leg_{i}")
        conf = PipelineConfig(
            stream="bench", payload_col="payload",
            payload_schema=payload_schema, num_buckets=64,
            files_per_bucket=fpb,
        )
        t0 = time.time()
        run_batch_replay(s, wal_df, tdir, conf)
        times.append(round(time.time() - t0, 2))
        shutil.rmtree(tdir, ignore_errors=True)
    print(json.dumps({"master": master, "times": times, "best": min(times)}))
    s.stop()


if __name__ == "__main__":
    main()
