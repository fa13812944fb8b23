"""As-of join semantics: inclusive ties, pre-first-match nulls, tie-break
among same-ts right rows, null right attributes carried faithfully."""

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.operators.asof import asof_join


def _dfs(spark):
    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 5, "l5"), (2, 50, "l50")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r10"), (1, 15, "r15"), (2, 60, "r60")],
        "k long, ts long, rv string",
    )
    return left, right


def test_asof_basic_and_inclusive_tie(spark):
    left, right = _dfs(spark)
    out = {(r.k, r.ts): r.rv_asof for r in asof_join(left, right, ["k"], "ts").collect()}
    assert out[(1, 5)] is None        # before any right row
    assert out[(1, 10)] == "r10"      # ts == right ts: INCLUSIVE
    assert out[(1, 20)] == "r15"      # latest at-or-before
    assert out[(2, 50)] is None       # right row is later


def test_asof_inner_drops_unmatched(spark):
    left, right = _dfs(spark)
    out = asof_join(left, right, ["k"], "ts", how="inner")
    assert {(r.k, r.ts) for r in out.collect()} == {(1, 10), (1, 20)}


def test_asof_tie_break_among_same_ts_right_rows(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 7, "a"), (1, 10, 9, "b")], "k long, ts long, ver long, rv string"
    )
    out = asof_join(left, right, ["k"], "ts", right_cols=["ver", "rv"], tie_break="ver")
    row = out.first()
    assert row.ver_asof == 9 and row.rv_asof == "b"  # max tie_break wins


def test_asof_null_right_attribute_is_carried(spark):
    left = spark.createDataFrame([(1, 20)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, "old"), (1, 10, None)], "k long, ts long, rv string"
    )
    out = asof_join(left, right, ["k"], "ts").first()
    # the ts=10 row is the as-of match even though its attribute is NULL —
    # a naive last(attr, ignorenulls) would wrongly surface "old"
    assert out.rv_asof is None


def test_range_join_count_boundaries(spark):
    from tap_rest_api_msdk_spark.operators.range_join import range_join_count

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:10:00"),
         (3, 2, "2024-01-01 10:00:00")],
        "event_id long, k long, ts string",
    ).selectExpr("event_id", "k", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:55:00"),  # exactly -300s from e1: INCLUDED
         (1, "2024-01-01 10:00:00"),  # == e1 ts: EXCLUDED (strict <)
         (1, "2024-01-01 10:09:00"),  # within e2's window [10:05, 10:10)
         (2, "2024-01-01 09:45:00")], # candidate bucket hit but outside window -> e3 = 0
        "k long, ts string",
    ).selectExpr("k", "cast(ts as timestamp) as ts")
    out = {r.event_id: r.n for r in
           range_join_count(left, right, ["k"], "ts", 300, out_col="n").collect()}
    # e1 [09:55,10:00): the -300s boundary row counts, its own ts doesn't;
    # e2 [10:05,10:10): only 10:09; e3 has a bucket candidate but no match
    assert out == {1: 1, 2: 1, 3: 0}


def test_asof_fuzz_vs_pandas_merge_asof(spark):
    """Seeded fuzz parity with pandas.merge_asof(direction='backward',
    allow_exact_matches=True) — the canonical as-of implementation."""
    import random

    import pandas as pd

    for seed in (5, 21, 77):
        rng = random.Random(seed)
        lrows = [(rng.randint(0, 4), rng.randint(0, 100), i) for i in range(60)]
        rrows = [(rng.randint(0, 4), rng.randint(0, 100), 1000 + i) for i in range(40)]
        # dedupe right on (k, ts): keep max rv (mirrors tie_break usage)
        rbest = {}
        for k, ts, rv in rrows:
            rbest[(k, ts)] = max(rbest.get((k, ts), -1), rv)
        rrows = [(k, ts, rv) for (k, ts), rv in rbest.items()]

        left = spark.createDataFrame(lrows, "k long, ts long, lid long")
        right = spark.createDataFrame(rrows, "k long, ts long, rv long")
        got = {r.lid: r.rv_asof
               for r in asof_join(left, right, ["k"], "ts", right_cols=["rv"]).collect()}

        lp = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
        rp = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts", kind="stable")
        ref = pd.merge_asof(lp, rp, on="ts", by="k",
                            direction="backward", allow_exact_matches=True)
        want = {int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
                for r in ref.itertuples()}
        assert got == want, seed


def test_range_join_fractional_window(spark):
    from tap_rest_api_msdk_spark.operators.range_join import range_join_count

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:01.500")], "event_id long, k long, ts string"
    ).selectExpr("event_id", "k", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00.000"),   # 1.5s before: inside a 1.5s window
         (1, "2024-01-01 09:59:59.999")],  # 1.501s before: outside
        "k long, ts string",
    ).selectExpr("k", "cast(ts as timestamp) as ts")
    out = range_join_count(left, right, ["k"], "ts", 1.5, out_col="n").first()
    assert out.n == 1  # int truncation to 1s would have counted 0
