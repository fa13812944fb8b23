"""Skew handling and maintenance: salted LWW on a hot key, compaction,
vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.operators.dedup import (
    lww_dedup,
    lww_dedup_salted,
    lww_dedup_window,
)
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable


def test_salted_lww_hot_key_agrees_with_plain(spark):
    """90% of events on ONE key (pathological skew): the salted two-phase
    plan must produce exactly the plain LWW result."""
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("seq"),
        F.when(F.col("id") % 10 < 9, F.lit("hot/repo")).otherwise(
            F.format_string("repo-%d", F.col("id") % 1000)
        ).alias("repo"),
        F.lit("p").alias("path"),
        F.sha2(F.col("id").cast("string"), 256).substr(1, 8).alias("commit"),
        F.format_string("v%d", F.col("id")).alias("content"),
    )
    plain = lww_dedup(df, ["repo", "path"], ["seq", "commit"]).select("repo", "seq")
    salted = lww_dedup_salted(df, ["repo", "path"], ["seq", "commit"], salt_buckets=32).select("repo", "seq")
    windowed = lww_dedup_window(df, ["repo", "path"], ["seq", "commit"]).select("repo", "seq")
    assert plain.exceptAll(salted).count() == 0 and salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(windowed).count() == 0 and windowed.exceptAll(plain).count() == 0
    # the hot key's winner is the global max seq among its 90k events
    hot = {r.repo: r.seq for r in salted.collect()}["hot/repo"]
    assert hot == n - 2  # id=99999 % 10 = 9 -> cold; 99998 % 10 = 8 -> hot


def test_compaction_purges_tombstones_and_merges_files(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake"), num_buckets=4)
    schema = "seq long, repo string, path string, commit string, op string, content string"
    mk = lambda rows: spark.createDataFrame(rows, schema)
    for i in range(4):
        # batch 3 deliberately leaves r0 alone so its tombstone survives
        lo = 1 if i == 3 else 0
        rows = [(i * 10 + j, f"r{j}", "p", f"c{i}{j}", "upsert", f"v{i}{j}") for j in range(lo, 5)]
        if i == 2:
            rows.append((i * 10 + 9, "r0", "p", "cD", "delete", None))
        t.merge_upsert(mk(rows), ["repo", "path"], ["seq", "commit"], i, op_col="op")
    before_live = {(r.repo, r.path): r.seq for r in t.to_df().collect()}
    assert ("r0", "p") not in before_live  # tombstoned at seq 29, never resurrected
    assert t.to_df(drop_deletes=False).filter(F.col("op") == "delete").count() == 1

    stats = t.compact(tombstone_watermark=10_000)
    assert not stats["skipped"]
    after_live = {(r.repo, r.path): r.seq for r in t.to_df().collect()}
    assert after_live == before_live  # live state unchanged
    assert t.to_df(drop_deletes=False).filter(F.col("op") == "delete").count() == 0

    removed = t.vacuum()
    assert removed > 0
    # table still reads correctly after vacuum
    assert {(r.repo, r.path): r.seq for r in t.to_df().collect()} == before_live
    # further merges still work post-compaction
    t.merge_upsert(
        mk([(1000, "r1", "p", "cz", "upsert", "new")]), ["repo", "path"], ["seq", "commit"], 99, op_col="op"
    )
    assert {r.repo: r.content for r in t.to_df().collect()}["r1"] == "new"


def test_jaccard_skew_guard_bounds_hot_shingle(spark):
    """A boilerplate shingle shared by EVERY doc is a quadratic hot key in
    the inverted-index self-join; max_shingle_freq must drop it while
    leaving genuine near-dup pairs intact."""
    from pyspark.sql import functions as F

    from tap_rest_api_msdk_spark.operators.neardup import jaccard_pairs, word_shingles

    boiler = "this file is part of the generated corpus do not edit"
    rows = [(i, f"{boiler} unique tail {i} " + " ".join(f"w{i}_{j}" for j in range(10)))
            for i in range(200)]
    # plant one true near-dup pair sharing everything
    rows.append((1000, rows[0][1] + " extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # without the guard: the boilerplate shingles join every doc to every
    # other doc -> candidate explosion (inter pairs ~ n^2)
    sh = docs.select(F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    hot_df = sh.groupBy("s").count().agg(F.max("count")).first()[0]
    assert hot_df == 201  # the planted shingle hits every doc

    guarded = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5,
                            max_shingle_freq=100)
    pairs = guarded.collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1000)}

    # and the guard bounds the candidate volume: with it, the inverted
    # index joins only on shingles with df <= 100
    unguarded_cands = (
        sh.alias("a").join(sh.alias("b"), "s").count()
    )
    assert unguarded_cands > 200 * 200  # quadratic without the guard


def test_contained_skew_guard_and_candidate_prune(spark):
    """r7: contained_docs switched to the count-window df filter plus a
    semi-joined verify — the pathological hot-shingle shape (ADVICE r6)
    must still df-cap the boilerplate shingle, keep the true containment
    pair, and never route full texts of non-candidates into the verify."""
    from tap_rest_api_msdk_spark.operators.neardup import contained_docs

    boiler = "this file is part of the generated corpus do not edit"
    rows = [
        (i, f"{boiler} unique tail {i} " + " ".join(f"w{i}_{j}" for j in range(10)))
        for i in range(200)
    ]
    # plant a true containment: doc 1000 is doc 0's text plus a suffix
    rows.append((1000, rows[0][1] + " trailing suffix tokens here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = contained_docs(docs, "doc_id", "text", n=3, max_shingle_freq=100)
    got = {(r.contained_id, r.container_id) for r in out.collect()}
    assert (0, 1000) in got
    # no false containments among the filler docs (distinct tails)
    assert all(a == 0 and b == 1000 for a, b in got)
