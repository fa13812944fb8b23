"""Sketch accuracy pins: portable HLL and histogram percentiles vs their
exact twins (the oracles verify determinism; these verify USEFULNESS)."""

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.functions.sketch import hist_percentiles, hll_distinct


def test_hll_within_rsd_of_exact(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    approx = {r.event_type: r.n for r in
              hll_distinct(ev, ["event_type"], "user_id", p=10, out_col="n").collect()}
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    for t in exact:
        assert abs(approx[t] - exact[t]) / exact[t] < 0.1, (t, approx[t], exact[t])


def test_hist_percentiles_within_bucket_error(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {r.event_type: (r.p50, r.p90, r.p99) for r in
           hist_percentiles(ev, ["event_type"], "value", n_buckets=256).collect()}
    pct = F.percentile(F.col("value"), F.lit([0.5, 0.9, 0.99]))
    exact = {r.event_type: tuple(r.e) for r in
             ev.groupBy("event_type").agg(pct.alias("e")).collect()}
    span = {r.event_type: r.s for r in
            ev.groupBy("event_type").agg((F.max("value") - F.min("value")).alias("s")).collect()}
    for t in exact:
        tol = span[t] / 256 * 2  # within ~2 bucket widths
        for a, e in zip(got[t], exact[t]):
            assert abs(a - e) <= tol, (t, a, e, tol)


def test_hist_percentiles_partition_invariant(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, hist_percentiles(ev, ["event_type"], "value").collect()))
    b = sorted(map(tuple, hist_percentiles(ev.repartition(17), ["event_type"], "value").collect()))
    assert a == b
