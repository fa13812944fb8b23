"""Count-min and Bloom sketches (functions/freq.py): structural
guarantees plus exact DuckDB twin-ship (the same property every portable
sketch in this repo carries)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


def test_countmin_never_underestimates(spark):
    from tap_rest_api_msdk_spark.functions.freq import countmin_estimates

    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "key string")
    est = {r["key"]: r["cms_count"] for r in countmin_estimates(df, "key", d=4, w=64).collect()}
    true = {r["key"]: r["n"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # CMS never underestimates
    assert est["hot"] >= 500


def test_countmin_matches_duckdb_twin(spark, tmp_path):
    from tap_rest_api_msdk_spark.functions.freq import countmin_estimates, countmin_oracle_sql

    rows = [(i % 101,) for i in range(5000)]
    df = spark.createDataFrame(rows, "user_id long")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    got = {
        r["user_id"]: r["cms_count"]
        for r in countmin_estimates(spark.read.parquet(p), "user_id", d=4, w=128).collect()
    }
    con = duckdb.connect()
    con.execute(f"create view t as select * from '{p}/*.parquet'")
    want = dict(con.execute(countmin_oracle_sql("t", "user_id", d=4, w=128)).fetchall())
    assert got == want


def test_bloom_no_false_negatives_and_twin(spark, tmp_path):
    from tap_rest_api_msdk_spark.functions.freq import (
        bloom_oracle_sql,
        bloom_positions,
        bloom_probe,
    )

    build = spark.createDataFrame([(i,) for i in range(0, 300, 3)], "key long")
    probe = spark.createDataFrame([(i,) for i in range(400) for _ in range(2)], "key long")
    pos = bloom_positions(build, "key", k=3, m=256)
    passed = bloom_probe(probe, "key", pos, k=3, m=256)
    passed_keys = {r["key"] for r in passed.select("key").distinct().collect()}
    build_keys = set(range(0, 300, 3))
    assert build_keys <= passed_keys  # NEVER a false negative
    # twin: counts match DuckDB exactly (false positives included)
    bp, pp = str(tmp_path / "b.parquet"), str(tmp_path / "p.parquet")
    build.write.parquet(bp)
    probe.write.parquet(pp)
    con = duckdb.connect()
    con.execute(f"create view b as select * from '{bp}/*.parquet'")
    con.execute(f"create view p as select * from '{pp}/*.parquet'")
    n_pass, n_exact, n_fp = con.execute(
        bloom_oracle_sql("b", "key", "p", "key", k=3, m=256)
    ).fetchone()
    assert n_pass == passed.count()
    assert n_exact == probe.join(build.distinct(), "key", "leftsemi").count()
    assert n_fp == n_pass - n_exact
    assert n_fp > 0  # tiny filter: FPs must actually occur for this test to bite


def test_bloom_pass_plan_is_broadcast(spark):
    from tap_rest_api_msdk_spark.functions.freq import bloom_positions, bloom_probe

    build = spark.createDataFrame([(i,) for i in range(50)], "key long")
    probe = spark.createDataFrame([(i,) for i in range(500)], "key long")
    out = bloom_probe(probe, "key", bloom_positions(build, "key", k=3, m=512), k=3, m=512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the filter ships to probe tasks
