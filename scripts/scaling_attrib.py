#!/usr/bin/env python
"""Stage-level attribution of the executor-scaling gap (r7; r6 verdict #1).

Runs the SAME CDC replay leg at local-cluster[2,4] and local-cluster[8,4]
(scripts/scaling_leg.py, fresh JVM each) with the Spark event log on,
then aggregates per-stage task metrics from the logs:

  executorRunTime, executorCpuTime, jvmGcTime, shuffle read/write bytes,
  fetch-wait time, shuffle-write time, memory/disk spill, input bytes.

The question this answers: when 4x executors yield only ~2.4x throughput,
WHERE does the lost wall-clock go — shuffle fetch (a network/disk-shaped
resource), GC, spill, or uniformly-inflated executor compute (the
signature of DRAM-bandwidth saturation, since memory-stall cycles are
charged to run time but not to useful work)?

Usage: python scripts/scaling_attrib.py [events] [out_json]
Defaults: 16M events, BENCH/scaling_attrib_r07.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "scaling_attrib_r07.json",
)


def _eventlog_lines(path: str):
    """Yield JSON lines from a Spark event log — either a single file or
    the Spark 4 rolling directory (eventlog_v2_*/events_* files)."""
    if os.path.isdir(path):
        for f in sorted(glob.glob(os.path.join(path, "events_*"))):
            with open(f) as fh:
                yield from fh
        return
    with open(path) as fh:
        yield from fh


def parse_eventlog(path: str) -> dict:
    """Aggregate SparkListenerStageCompleted metrics, split by stage name."""
    stages = {}
    tot = {}
    for line in _eventlog_lines(path):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            name = si.get("Stage Name", "?").split(" at ")[0]
            acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}

            def val(*names):
                for n in names:
                    v = acc.get(n)
                    if v is not None:
                        try:
                            return int(v)
                        except (TypeError, ValueError):
                            pass
                return 0

            row = {
                "run_ms": val("internal.metrics.executorRunTime"),
                "cpu_ms": val("internal.metrics.executorCpuTime") // 1_000_000,
                "gc_ms": val("internal.metrics.jvmGCTime"),
                "sh_read_mb": (val("internal.metrics.shuffle.read.remoteBytesRead")
                               + val("internal.metrics.shuffle.read.localBytesRead")) >> 20,
                "fetch_wait_ms": val("internal.metrics.shuffle.read.fetchWaitTime"),
                "sh_write_mb": val("internal.metrics.shuffle.write.bytesWritten") >> 20,
                "sh_write_ms": val("internal.metrics.shuffle.write.writeTime") // 1_000_000,
                "spill_mb": (val("internal.metrics.memoryBytesSpilled")
                             + val("internal.metrics.diskBytesSpilled")) >> 20,
                "input_mb": val("internal.metrics.input.bytesRead") >> 20,
            }
            agg = stages.setdefault(name, dict.fromkeys(row, 0))
            for k, v in row.items():
                agg[k] += v
                tot[k] = tot.get(k, 0) + v
    return {"total": tot, "by_stage": stages}


def main() -> None:
    base = tempfile.mkdtemp(prefix="attrib-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    leg = os.path.join(here, "scripts", "scaling_leg.py")
    try:
        # synthesize the WAL once (same generator as the bench's scaling pair)
        from tap_rest_api_msdk_spark.session import get_spark
        from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal

        s = get_spark("attrib-synth", cores=32, shuffle_partitions=64)
        s.sparkContext.setLogLevel("ERROR")
        wal = os.path.join(base, "wal")
        synth_repo_wal(s, EVENTS, n_repos=2000, n_paths=5000, partitions=128
                       ).write.mode("overwrite").parquet(wal)
        schema = s.read.json(
            s.read.parquet(wal).limit(200).select("payload").rdd.map(lambda r: r[0])
        ).schema
        with open(wal + ".schema.json", "w") as fh:
            fh.write(schema.json())
        s.stop()

        out = {"events": EVENTS, "legs": {}}
        for master, tag in (("local-cluster[2,4,10240]", "2exec"),
                            ("local-cluster[8,4,10240]", "8exec")):
            ev_dir = os.path.join(base, f"ev_{tag}")
            env = dict(os.environ, LEG_REPEATS="2", LEG_FPB="4",
                       LEG_EVENTLOG_DIR=ev_dir)
            r = subprocess.run(
                [sys.executable, leg, wal, master, base],
                capture_output=True, text=True, env=env, timeout=3000,
            )
            best = json.loads(r.stdout.strip().splitlines()[-1])
            logs = sorted(glob.glob(os.path.join(ev_dir, "*")))
            metrics = parse_eventlog(logs[-1]) if logs else {}
            out["legs"][tag] = {"times": best["times"], "best": best["best"],
                                "metrics": metrics}
            print(f"{tag}: times={best['times']} total={metrics.get('total')}",
                  flush=True)
        t2, t8 = out["legs"]["2exec"]["best"], out["legs"]["8exec"]["best"]
        out["scaling_efficiency_exec_strong"] = round((t2 / t8) / 4, 3)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)
        print(json.dumps({"out": OUT,
                          "eff": out["scaling_efficiency_exec_strong"]}))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
