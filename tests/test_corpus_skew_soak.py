"""Planted-skew soak (r4 verdict item #8): the join-free count-window
corpus scorers (``substring_dup_rate``, ``text_oov_rate``,
``text_bigram_logprob``, ``text_unigram_surprisal``) claim their hot-key
window partitions spill safely. Verify it adversarially: EVERY document
shares one boilerplate sentence — so one 40-char window hash and a
handful of tokens are hot across the whole corpus (the worst case the
docstrings argue about) — at a corpus deliberately larger than the unit
fixtures, under the test session's bounded driver memory. Assertions:
the jobs complete AND the outputs are exact vs the registered DuckDB
oracles running on the same parquet."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

# default sized for CI; SOAK_DOCS=400000 reproduces the round-notes run
# (every scale shares the one hot window across ~all docs)
N_DOCS = int(os.environ.get("SOAK_DOCS", "40000"))
BOILER = "the quick brown fox jumps over the lazy dog again and again forever"
SOAK_QUERIES = [
    "substring_dup_rate",
    "text_oov_rate",
    "text_bigram_logprob",
    "text_unigram_surprisal",
    "line_dedup",  # boilerplate lines duplicate across ~ALL docs here
]


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    """documents.parquet where every doc = shared boilerplate + unique
    filler: one window hash / a few tokens hot across ~all docs."""
    d = str(tmp_path_factory.mktemp("skewcorpus"))
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(BOILER + " "),
            # unique filler so dedup-style stats aren't degenerate
            F.format_string(
                "uniq%d alpha%d beta%d gamma%d", F.col("id"), F.col("id"),
                (F.col("id") * 7) % 1000003, (F.col("id") * 13) % 1000033,
            ),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("soak").alias("source"),
    )
    docs = docs.withColumn("n_chars", F.length("text"))
    docs.repartition(16).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from read_parquet("
        f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet')"
    )
    cur = con.sql(sql)
    cols = [c[0] for c in cur.description]
    return cols, cur.fetchall()


def _norm(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r))
        out.append(tuple(
            (round(v, 9) if isinstance(v, float) else v)
            for _, v in sorted(d.items())
        ))
    return sorted(out)


@pytest.mark.parametrize("name", SOAK_QUERIES)
def test_planted_skew_exact_vs_oracle(spark, skew_dir, name):
    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    sdf = q(spark, skew_dir)
    scols = sorted(sdf.columns)
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    ocols, orows = _oracle_rows(sql, skew_dir)
    assert sorted(ocols) == scols, (name, ocols, scols)
    orows = _norm(orows, ocols)
    assert len(srows) == len(orows) == N_DOCS, (name, len(srows), len(orows))
    assert srows == orows, (
        name,
        next((a, b) for a, b in zip(srows, orows) if a != b),
    )


def test_hot_window_is_actually_hot(spark, skew_dir):
    """Sanity of the construction: the boilerplate must make >=1 window
    hash shared by ~ALL docs (otherwise the soak tests nothing)."""
    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    W, STRIDE = 40, 8
    npos = F.greatest(
        F.floor((F.length("text") - F.lit(W)) / F.lit(STRIDE)) + 1, F.lit(1)
    ).cast("int")
    wins = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), npos - 1),
                lambda p: F.xxhash64(
                    F.substring(F.col("text"), p * F.lit(STRIDE) + 1, W)
                ),
            )
        ).alias("wh"),
    )
    hottest = (
        wins.groupBy("wh").agg(F.countDistinct("doc_id").alias("d"))
        .agg(F.max("d")).collect()[0][0]
    )
    assert hottest == N_DOCS
