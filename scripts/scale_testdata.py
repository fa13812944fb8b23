#!/usr/bin/env python
"""Measurement-only scale-up of a testdata sf directory.

Replicates every table K times with consistent key offsets so join
relationships are preserved, and applies a per-replica caesar shift to
document text so shingle/minhash/token workloads scale like real data
(10x distinct shingles, same per-shingle df distribution) instead of
degenerating into 10 exact copies of every doc.

This is NOT oracle data — it exists so isolated before/after timings can
be taken at sf1.0-like volume after the driver-generated sf1.0 directory
was reclaimed. Usage:

  python scripts/scale_testdata.py --src /root/testdata/sf0.1 \
      --dst /root/sfdata/sf1.0x --k 10
"""

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "nation": [],
    "region": [],
}

SMALL = {"nation", "region"}  # dimension tables: copy once, no replicas


def caesar_table(shift: int) -> dict:
    up = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lo = up.lower()
    t = {}
    for s in (up, lo):
        for i, ch in enumerate(s):
            t[ord(ch)] = ord(s[(i + shift) % 26])
    return t


def scale(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name, keys in KEY_COLS.items():
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        base = pq.read_table(path)
        if name in SMALL or k == 1:
            pq.write_table(base, os.path.join(dst, f"{name}.parquet"))
            print(f"{name}: copied {base.num_rows}")
            continue
        reps = []
        for i in range(k):
            t = base
            for kc in keys:
                t = t.set_column(
                    t.schema.get_field_index(kc), kc,
                    pc.add(t.column(kc), i * STRIDE),
                )
            if name == "documents" and i > 0:
                tbl = caesar_table(i)
                texts = t.column("text").to_pylist()
                texts = [x.translate(tbl) if x is not None else None for x in texts]
                t = t.set_column(
                    t.schema.get_field_index("text"), "text",
                    pa.array(texts, type=pa.string()),
                )
            reps.append(t)
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {base.num_rows} -> {out.num_rows}")
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args()
    scale(a.src, a.dst, a.k)
