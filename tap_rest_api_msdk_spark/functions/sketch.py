"""Distinct-count sketches (HyperLogLog) — portable, oracle-verifiable.

Spark ships ``approx_count_distinct`` (HLL++), but its register layout and
estimate are implementation-internal — no external engine can verify its
output. :func:`hll_distinct` implements classic HyperLogLog *explicitly*
over the portable 60-bit hash, so the registers, harmonic estimate, and
small-range (linear-counting) correction are bit-reproducible in any SQL
engine with ``md5()`` — the cross-engine verification twin of the built-in.

Physical shape (the part that matters at 10^10 rows): register extraction
is a pure projection; ``groupBy(group, bucket).max(rho)`` gets map-side
partial aggregation, so the shuffle carries at most m=2^p rows per group
regardless of input size — identical to the built-in sketch's merge
topology.

Determinism notes:
* hash60 is strictly positive -> shifts/masks identical across engines;
* rho via ``length(bin(w))`` — integer-exact leading-zero count;
* the harmonic sum is kept as a scaled BIGINT (sum of 2^(smax - M_j)), so
  the only floating-point steps are one long->double conversion, one
  division, and (in the small-range branch) one ``ln`` — each a single
  correctly-rounded IEEE operation on identical inputs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.functions.portable_hash import hash60


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 10,
    out_col: str = "n_approx",
) -> DataFrame:
    """Explicit HyperLogLog distinct count per group (portable mode).

    ``p`` index bits -> m = 2^p registers; standard alpha_m bias constant;
    linear-counting correction for E <= 2.5 m (Flajolet et al. 2007).
    """
    m = 1 << p
    wbits = 60 - p          # width of the rho field
    smax = wbits + 1        # max rho (all-zero field)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # alpha * m^2 * 2^smax: m and 2^smax are powers of two, so this scale
    # factor is EXACT (no rounding) — embed the same literal in oracle SQL
    scale = alpha * m * m * float(1 << smax)

    h = hash60(F.col(value_col).cast("string"))
    bucket = F.shiftrightunsigned(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = F.when(w == 0, F.lit(smax)).otherwise(F.lit(smax) - F.length(F.bin(w)))

    regs = (
        df.select(*group_cols, bucket.alias("__b"), rho.alias("__rho"))
        .groupBy(*group_cols, "__b")
        .agg(F.max("__rho").alias("__M"))
    )
    term = F.expr(f"shiftleft(cast(1 as bigint), {smax} - __M)")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).alias("__Sp"), F.count(F.lit(1)).alias("__C")
    )
    V = F.lit(m) - F.col("__C")  # zero (absent) registers
    S = F.col("__Sp") + V * F.lit(1 << smax)  # scaled harmonic denominator
    e_raw = F.lit(scale) / S
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (V > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / V),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.floor(e).cast("long").alias(out_col))


def hll_oracle_sql(
    table: str, group_col: str, value_col: str, p: int = 10, out_col: str = "n_approx"
) -> str:
    """DuckDB twin of :func:`hll_distinct` (identical formula + literals)."""
    m = 1 << p
    wbits = 60 - p
    smax = wbits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = repr(alpha * m * m * float(1 << smax))
    mask = (1 << wbits) - 1
    return f"""
        with h as (
            select {group_col},
                   cast(concat('0x', substr(md5({value_col}::varchar), 1, 15)) as bigint) as h
            from {table}
        ), r as (
            select {group_col}, h >> {wbits} as b,
                   case when (h & {mask}) = 0 then {smax}
                        else {smax} - len(bin(h & {mask})) end as rho
            from h
        ), regs as (
            select {group_col}, b, max(rho) as M from r group by {group_col}, b
        ), agg as (
            select {group_col},
                   sum(1::bigint << ({smax} - M)) as Sp,
                   count(*) as C
            from regs group by {group_col}
        )
        select {group_col},
               cast(floor(
                   case when ({scale} / (Sp + ({m} - C) * (1::bigint << {smax}))) <= {2.5 * m}
                             and ({m} - C) > 0
                        then {float(m)} * ln({float(m)} / ({m} - C))
                        else {scale} / (Sp + ({m} - C) * (1::bigint << {smax}))
                   end) as bigint) as {out_col}
        from agg
    """
