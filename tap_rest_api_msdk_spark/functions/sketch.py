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


def hist_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_buckets: int = 256,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    out_prefix: str = "p",
) -> DataFrame:
    """Approximate percentiles via a deterministic equi-width histogram —
    the mergeable sketch path for quantiles (exact ``percentile`` needs a
    full sort per group; a histogram is two map-side-combined aggregates
    regardless of input size, like every production quantile sketch).

    Unlike t-digest/KLL, the equi-width histogram is ORDER-FREE and
    arithmetic-exact-reproducible, so an external SQL engine computes the
    identical estimate: bucket = floor((v-lo)/w) on IEEE doubles, estimate
    = lo + w*(bucket + (q*n - cum_before)/count) — single-rounded IEEE ops
    on identical inputs. Error bound: (hi-lo)/n_buckets per estimate.
    """
    gc = [F.col(c) for c in group_cols]
    stats = df.groupBy(*gc).agg(
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    joined = df.join(F.broadcast(stats), list(group_cols))
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(value_col) - F.col("__lo")) / w),
            F.lit(n_buckets - 1),
        )
    ).cast("long")
    counts = joined.groupBy(*gc, bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.first("__lo").alias("__lo"),
        F.first("__hi").alias("__hi"),
        F.first("__n").alias("__n"),
    )
    from pyspark.sql import Window

    cum = F.sum("__c").over(
        Window.partitionBy(*gc).orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    )
    hist = counts.withColumn("__cum", cum)

    outs = []
    for q in quantiles:
        t = F.lit(float(q)) * F.col("__n")
        w2 = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
        est = F.col("__lo") + w2 * (
            F.col("__b") + (t - (F.col("__cum") - F.col("__c"))) / F.col("__c")
        )
        est = F.when(F.col("__hi") == F.col("__lo"), F.col("__lo")).otherwise(
            F.least(est, F.col("__hi"))
        )
        name = f"{out_prefix}{int(q * 100)}"
        # first bucket whose cumulative count reaches q*n
        picked = (
            hist.filter(F.col("__cum") >= t)
            .groupBy(*gc)
            .agg(F.min(F.struct(F.col("__b"), est.alias("e"))).alias("__w"))
            .select(*gc, (F.floor(F.col("__w.e") * 1000000) / 1000000).alias(name))
        )
        outs.append(picked)
    out = outs[0]
    for o in outs[1:]:
        out = out.join(o, list(group_cols))
    return out


def hist_percentiles_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    n_buckets: int = 256,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    out_prefix: str = "p",
) -> str:
    """DuckDB twin of :func:`hist_percentiles` (identical formulas)."""
    qcols = []
    for q in quantiles:
        name = f"{out_prefix}{int(q * 100)}"
        qcols.append(f"""
            (select floor(
                 case when h.hi = h.lo then h.lo
                      else least(
                          h.lo + (h.hi - h.lo) / {float(n_buckets)} *
                          (x.b + ({float(q)} * h.n - (x.cum - x.c)) / x.c),
                          h.hi)
                 end * 1000000) / 1000000
             from hist x join stats h using ({group_col})
             where x.{group_col} = g.{group_col} and x.cum >= {float(q)} * h.n
             order by x.b limit 1) as {name}""")
    cols = ",".join(qcols)
    return f"""
        with stats as (
            select {group_col}, min({value_col}) as lo, max({value_col}) as hi,
                   count(*) as n
            from {table} group by {group_col}
        ), bucketed as (
            select t.{group_col},
                   case when s.hi = s.lo then 0
                        else least(
                            floor(({value_col} - s.lo) / ((s.hi - s.lo) / {float(n_buckets)})),
                            {n_buckets - 1})
                   end::bigint as b
            from {table} t join stats s using ({group_col})
        ), hist as (
            select {group_col}, b, count(*) as c,
                   sum(count(*)) over (
                       partition by {group_col} order by b
                       rows between unbounded preceding and current row
                   ) as cum
            from bucketed group by {group_col}, b
        )
        select g.{group_col}, {cols}
        from (select distinct {group_col} from {table}) g
    """


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
