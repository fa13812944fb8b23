"""Frequency / membership sketches — count-min and Bloom — portable and
oracle-verifiable.

Both sketches are built from the same 60-bit md5-derived portable hash the
MinHash/HLL family uses (functions/portable_hash.py), reduced mod the
Mersenne prime 2^31-1 and fed through universal hash lanes
``(a_i * h + b_i) mod P`` with fixed literal coefficients — every
intermediate stays below 2^62 (no signed-64 overflow in any engine), so
DuckDB reproduces the sketch bit-for-bit and the driver's value-hash gate
verifies estimates EXACTLY, not approximately.

Scale shapes:
- count-min: two map-side-combined aggregates regardless of input size
  (the counters), then a broadcast-join probe — the standard heavy-hitter
  path when exact groupBy-count per key would shuffle the full keyspace.
- Bloom: the (lane, position) set of a small dimension broadcasts to the
  probe side — the runtime-filter / semi-join-pushdown pattern Spark's
  own bloom-filter join uses, expressed portably.

No reference counterpart (the tap has no sketches); these extend the
training-data toolkit alongside HLL/histograms (SURVEY §2.5).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.functions.portable_hash import hash60, hash60_sql

P31 = (1 << 31) - 1  # Mersenne prime 2^31-1


def _lanes(d: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i odd, both < P31)."""
    out = []
    for i in range(d):
        a = (2654435761 * (i + 1)) % P31
        b = (40503 * (i + 1) + 7919) % P31
        out.append((a | 1, b))
    return out


def _h31(col):
    return hash60(col.cast("string")) % F.lit(P31)


def _h31_sql(expr: str) -> str:
    return f"({hash60_sql(expr)} % {P31})"


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def countmin_estimates(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    out_col: str = "cms_count",
) -> DataFrame:
    """Count-min estimate per DISTINCT key: d×w counters built in one
    map-side-combined aggregate, estimates = min over the d lanes.

    Order-free and integer-exact, so (unlike Misra-Gries, whose state
    depends on arrival order) it admits a bit-exact SQL twin. Guarantees:
    est >= true count, est <= true + eps*N with eps = e/w at confidence
    1 - e^-d. At 10^10 rows the counter table is d*w cells regardless of
    input size and broadcasts to the probe side."""
    lanes = _lanes(d)
    # ONE map-side-combined aggregate collapses the input to (distinct
    # key, multiplicity) BEFORE any hashing: the portable hash is md5-
    # derived, so hashing every raw row paid |rows| * d md5 lanes where
    # |distinct keys| suffice — counter cell (lane, bucket) then counts
    # SUM(multiplicity) of the keys hashing there, which is identical to
    # counting raw rows. The same frame is the probe set (it IS the
    # distinct-key table), so the former second full scan + distinct
    # exchange disappears; the barrier keeps the base from being computed
    # once per consumer.
    base = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True)
    )
    ex = base.select(
        "key", "__n", F.explode(buckets_for(F.col("key"), lanes, w)).alias("lb")
    ).select("key", "__n", F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("bucket"))
    counters = ex.groupBy("lane", "bucket").agg(F.sum("__n").alias("c"))
    return (
        ex.join(F.broadcast(counters), ["lane", "bucket"])
        .groupBy("key")
        .agg(F.min("c").alias(out_col))
        .select(F.col("key").alias(key_col), out_col)
    )


def buckets_for(col, lanes, w: int):
    h = _h31(col)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("lane"),
                ((F.lit(a) * h + F.lit(b)) % F.lit(P31) % F.lit(w)).alias("bucket"),
            )
            for i, (a, b) in enumerate(lanes)
        ]
    )


def countmin_oracle_sql(
    table: str, key_expr: str, d: int = 4, w: int = 256, where: str = "true"
) -> str:
    """DuckDB twin: same lanes, same counters, same min. The hash is
    computed over the key cast to varchar (matching Spark's
    ``cast(key as string)`` rendering); the output keeps the native type."""
    lanes = _lanes(d)
    lane_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(lanes))
    return f"""
        with src as (
            select {key_expr} as key,
                   {_h31_sql(f"cast({key_expr} as varchar)")} as h
            from {table} where {where}
        ), lanes(lane, a, b) as (values {lane_rows}),
        counters as (
            select lane, ((a * h + b) % {P31}) % {w} as bucket,
                   count(*) as c
            from src cross join lanes
            group by lane, bucket
        ), probes as (
            select distinct key, lane, ((a * h + b) % {P31}) % {w} as bucket
            from src cross join lanes
        )
        select p.key, min(c.c) as cms_count
        from probes p join counters c using (lane, bucket)
        group by p.key
    """


# ---------------------------------------------------------------------------
# Bloom filter membership
# ---------------------------------------------------------------------------

def bloom_positions(df: DataFrame, key_col: str, k: int = 7, m: int = 1 << 16) -> DataFrame:
    """The filter itself: the DISTINCT (lane, bit position) set of the
    build side — tiny (≤ k * n_build rows, ≤ k*m distinct), broadcastable."""
    lanes = _lanes(k)
    return (
        df.select(F.explode(buckets_for(F.col(key_col), lanes, m)).alias("lb"))
        .select(F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame,
    probe_col: str,
    positions: DataFrame,
    k: int = 7,
    m: int = 1 << 16,
) -> DataFrame:
    """Rows of ``probe`` that PASS the filter (all k positions set).

    The broadcast (lane, pos) join is the distributed runtime-filter
    shape: the filter ships to every probe task; rows failing any lane
    never reach the real join/shuffle."""
    lanes = _lanes(k)
    # the all-k-lanes check runs per DISTINCT key (a key appearing in many
    # probe rows would otherwise accumulate k hits per row)
    exploded = (
        probe.select(probe_col).distinct()
        .select(probe_col, F.explode(buckets_for(F.col(probe_col), lanes, m)).alias("lb"))
        .select(probe_col, F.col("lb.lane").alias("lane"), F.col("lb.bucket").alias("pos"))
    )
    hits = (
        exploded.join(F.broadcast(positions), ["lane", "pos"])
        .groupBy(probe_col)
        .agg(F.count(F.lit(1)).alias("__k_hit"))
        .filter(F.col("__k_hit") == k)
        .select(probe_col)
    )
    return probe.join(hits, probe_col, "leftsemi")


def bloom_oracle_sql(
    build_table: str,
    build_expr: str,
    probe_table: str,
    probe_expr: str,
    k: int = 7,
    m: int = 1 << 16,
    build_where: str = "true",
) -> str:
    """DuckDB twin of build+probe: pass/exact/false-positive counts."""
    lanes = _lanes(k)
    lane_rows = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(lanes))
    return f"""
        with lanes(lane, a, b) as (values {lane_rows}),
        build as (
            select distinct {build_expr} as key,
                   {_h31_sql(f"cast({build_expr} as varchar)")} as h
            from {build_table} where {build_where}
        ), positions as (
            select distinct lane, ((a * h + b) % {P31}) % {m} as pos
            from build cross join lanes
        ), probe as (
            select {probe_expr} as key,
                   {_h31_sql(f"cast({probe_expr} as varchar)")} as h
            from {probe_table}
        ), probe_pos as (
            select key, lane, ((a * h + b) % {P31}) % {m} as pos
            from (select distinct key, h from probe) cross join lanes
        ), passing as (
            select pp.key
            from probe_pos pp join positions po using (lane, pos)
            group by pp.key having count(*) = {k}
        )
        select
            cast((select count(*) from probe where key in (select key from passing)) as bigint)
                as n_bloom_pass,
            cast((select count(*) from probe where key in (select key from build)) as bigint)
                as n_exact,
            cast((select count(*) from probe
                  where key in (select key from passing)
                    and key not in (select key from build)) as bigint)
                as n_false_pos
    """
