#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

``bench.py`` is the frozen measurement contract; this harness exists for
optimization work: time any subset of the registered queries with the
noop sink (so the computation is measured, not the sink), repeat them,
and capture ``explain("formatted")`` plans to files.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries dedup_minhash_lsh,dedup_ngram_jaccard \
      --repeats 2 --plans plans/r07 --suffix before

Prints one JSON line: {"sf": ..., "queries": {name: [t0, t1, ...]}}.
Session config mirrors bench.py (local[$SPARK_GRAFT_CPUS], shuffle
partitions = 2x cores).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", required=True, help="comma-separated query names, or 'all'")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. before/after")
    args = ap.parse_args()

    from tap_rest_api_msdk_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    names = list(qmap) if args.queries == "all" else args.queries.split(",")

    out: dict = {"sf": args.sf, "queries": {}}
    for name in names:
        fn = qmap[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            sfx = f"_{args.suffix}" if args.suffix else ""
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.plans, f"{name}{sfx}.txt"), "w") as fh:
                fh.write(plan)
        ts = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out["queries"][name] = ts
        print(f"# {name}: {ts}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
