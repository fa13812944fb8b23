#!/usr/bin/env python
"""Profile the prescribed local[8] -> local[32] scaling pair.

Synthesizes one WAL at $EVENTS (default 16M), then replays it (1 batch)
at each parallelism with per-phase wall times (metrics job vs merge job vs
driver-side commit) so the serial fraction is attributable, not guessed.

Usage: python scripts/profile_scaling.py [events] [cores ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
CORES = [int(c) for c in sys.argv[2:]] or [32, 8]
REPEATS = int(os.environ.get("PROF_REPEATS", "2"))
SHREDDED = os.environ.get("PROF_SHREDDED", "0") == "1"


def main() -> None:
    from tap_rest_api_msdk_spark.session import get_spark
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.pipeline import (
        PipelineConfig,
        run_batch_replay,
    )

    base = tempfile.mkdtemp(prefix="prof-", dir="/dev/shm")
    try:
        spark = get_spark("prof-synth", cores=32, shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        wal_path = os.path.join(base, "wal")
        t0 = time.time()
        synth_repo_wal(
            spark, EVENTS, n_repos=2000, n_paths=5000, partitions=128,
            shredded=SHREDDED,
        ).write.mode("overwrite").parquet(wal_path)
        print(f"synth {EVENTS} events: {time.time()-t0:.1f}s", flush=True)
        if SHREDDED:
            payload_schema = spark.read.parquet(wal_path).schema["payload"].dataType
        else:
            payload_schema = spark.read.json(
                spark.read.parquet(wal_path).limit(200).select("payload").rdd.map(lambda r: r[0])
            ).schema
        spark.stop()

        out = {}
        for cores in CORES:
            best = None
            for i in range(REPEATS):
                s = get_spark(f"prof-{cores}", cores=cores, shuffle_partitions=2 * cores)
                s.sparkContext.setLogLevel("ERROR")
                wal_df = s.read.parquet(wal_path)
                conf = PipelineConfig(
                    stream="bench", payload_col="payload",
                    payload_schema=payload_schema, num_buckets=64,
                )
                tdir = os.path.join(base, f"t{cores}_{i}")
                t0 = time.time()
                run_batch_replay(s, wal_df, tdir, conf)
                dt = time.time() - t0
                print(f"local[{cores}] run{i}: {dt:.1f}s "
                      f"({EVENTS/dt/1000:.0f}k ev/s)", flush=True)
                best = dt if best is None else min(best, dt)
                shutil.rmtree(tdir, ignore_errors=True)
                s.stop()
            out[cores] = best
        if 8 in out and 32 in out:
            eff = (out[8] / out[32]) / 4
            print(json.dumps({
                "events": EVENTS,
                "seconds": {str(k): round(v, 1) for k, v in out.items()},
                "eps": {str(k): round(EVENTS / v) for k, v in out.items()},
                "scaling_efficiency_8_to_32": round(eff, 3),
            }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
