"""Mirror of the driver's correctness gate: run every queries() entry on
sf0.01 and compare against its oracle_sql() twin in DuckDB — row count,
column names/types, and order-insensitive value equality.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def to_sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normalized = [tuple(normalize(r[i]) for i in idx) for r in rows]
    # None-safe total order (rollup/grouping-set rows carry null keys)
    return sorted(normalized, key=lambda t: tuple((v is None, str(v)) for v in t))


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(ORACLES[name])
    ocols = rel.columns
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    a = to_sorted_rows(scols, srows)
    b = to_sorted_rows(ocols, orows)
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, f"{name}: first mismatch {a[mismatches[0]]} vs {b[mismatches[0]]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_less_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # rows-only smoke (driver's weaker check)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"user_id", "event_id", "event_type", "value", "props_k"}


def test_approx_distinct_within_rsd_of_exact(spark):
    """The HLL sketch must land within ~3x its configured rsd of the exact
    twin (accuracy contract for the oracle-less sketch query)."""
    exact = {
        r.event_type: r.n_users
        for r in QUERIES["distinct_users_exact"](spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in QUERIES["approx_distinct_users"](spark, SF_DIR).collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.06 * n), (k, n, approx[k])
