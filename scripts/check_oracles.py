#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, schema (column names sorted), and exact values (columns sorted
by name, rows sorted by all columns) — the same contract the driver's
CORRECTNESS_r{N}.json gate checks.

Usage:
  python scripts/check_oracles.py [--sf 0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Render a cell to a dtype-strict string, mirroring the driver's
    string-hash: int 149174 and float 149174.0 must NOT compare equal
    (a DuckDB HUGEINT aggregate surfacing as pandas float64 is a real
    mismatch the driver catches — this gate must catch it too)."""
    import numpy as np

    if v is None:
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:NaN"
        return f"f:{f!r}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (bytes, bytearray)):
        return f"y:{bytes(v).hex()}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "a:[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "m:{" + ",".join(f"{k}={norm_cell(v[k])}" for k in sorted(v)) + "}"
    # pandas NaT / Decimal / timestamps: fall back to typed repr
    if v != v:  # NaN-like (NaT)
        return "f:NaN"
    return f"o:{type(v).__name__}:{v!r}"


def frame_key(df):
    """pandas DF -> (n_rows, sorted col names, sorted dtype-strict row
    tuples). Every cell is rendered to a typed string so cross-engine
    dtype drift (HUGEINT->float64, int32 vs int64 is NOT collapsed by
    Python ``==``) fails here exactly as it fails the driver."""
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return len(rows), cols, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"

    import duckdb
    import __spark_entry__ as entry

    from tap_rest_api_msdk_spark.session import get_spark

    spark = get_spark("oracle-check", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    qmap = entry.queries()
    omap = entry.oracle_sql()
    names = args.queries or list(qmap)
    failures = []
    for name in names:
        try:
            sdf = qmap[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERROR {e}")
            failures.append(name)
            continue
        if name not in omap:
            print(f"{name}: NO ORACLE ({len(sdf)} rows)")
            failures.append(name)
            continue
        try:
            odf = con.execute(omap[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            failures.append(name)
            continue
        sn, sc, sr = frame_key(sdf)
        on, oc, or_ = frame_key(odf)
        rows_ok, schema_ok = sn == on, sc == oc
        vals_ok = rows_ok and schema_ok and sr == or_
        status = "OK" if (rows_ok and schema_ok and vals_ok) else "FAIL"
        print(f"{name}: {status} rows={sn}/{on} schema={'ok' if schema_ok else f'{sc} != {oc}'}"
              + ("" if vals_ok else " VALUES-DIFFER"))
        if status == "FAIL":
            failures.append(name)
            if rows_ok and schema_ok:
                diffs = [(a, b) for a, b in zip(sr, or_) if a != b][:3]
                for a, b in diffs:
                    print(f"   spark : {a}\n   oracle: {b}")
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
