"""Physical-plan assertions: the plans we'd want at 100 TB, not just plans
that pass. Checks pushdown, broadcast choice, partial aggregation, Python-
free hot paths, and the merge's single-exchange property.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tap_rest_api_msdk_spark.operators.incremental import incremental_filter

SF_DIR = "/root/testdata/sf0.01"
QUERIES = entry_mod.queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_incremental_filter_pushed_to_scan(spark):
    df = incremental_filter(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), "event_id", 5000
    )
    plan = plan_of(df)
    assert "PushedFilters" in plan and "GreaterThan(event_id,5000)" in plan


def test_scan_prunes_columns(spark):
    """A 2-column projection must not read all columns (ReadSchema check)."""
    df = QUERIES["flatten_props"](spark, SF_DIR)
    plan = plan_of(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "props" in read_schema and "event_id" in read_schema
    assert "user_id" not in read_schema and "value" not in read_schema


def test_broadcast_joins_chosen_for_small_dims(spark):
    plan = plan_of(QUERIES["join_enrich_broadcast"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    plan3 = plan_of(QUERIES["top_revenue_orders"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan3


def test_hot_paths_are_python_free(spark):
    """No Python evaluation nodes in any native-path operator query."""
    for name in [
        "lww_latest_state",
        "incremental_filter",
        "flatten_props",
        "bookmark_state",
        "lineage_metrics",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_tokens",
        "text_quality",
        "text_langid",
        "pricing_summary",
    ]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, name
        assert "PythonUDF" not in plan, name


def test_aggregations_have_partial_phase(spark):
    """Map-side combine: HashAggregate appears in partial+final pairs."""
    plan = plan_of(QUERIES["pricing_summary"](spark, SF_DIR))
    assert "partial_" in plan  # partial_sum / partial_count before shuffle
    plan2 = plan_of(QUERIES["lww_latest_state"](spark, SF_DIR))
    assert "partial_max" in plan2  # LWW aggregate pre-combines map-side


def test_lww_latest_is_partial_aggregate_single_exchange(spark):
    """The latest-state query must be a two-phase aggregate (struct-max
    compiles to SortAggregate — structs aren't hash-aggregable — but the
    partial/final split still pre-combines map-side) with exactly one
    shuffle, NOT a row_number window that ships every event."""
    plan = plan_of(QUERIES["lww_latest_state"](spark, SF_DIR))
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1
    assert "row_number" not in plan


def test_merge_is_single_exchange(spark, tmp_path):
    """The lake-table merge plan: exactly ONE shuffle (the bucket
    repartition); LWW rides the in-partition sort, the write consumes the
    same layout."""
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
    from pyspark.sql import Window

    wal = synth_repo_wal(spark, 2000, n_repos=5, n_paths=20)
    # reproduce merge_upsert's first-batch plan shape
    b = wal.withColumn(
        "__bucket", F.pmod(F.xxhash64("repo", "path"), F.lit(16)).cast("int")
    ).repartition(16, "__bucket")
    w = Window.partitionBy("__bucket").orderBy(
        "repo", "path", F.col("seq").desc(), F.col("commit").desc()
    )
    lagged = F.lag("repo").over(w)
    merged = b.withColumn(
        "__first", lagged.isNull() | (lagged != F.col("repo")) | (F.lag("path").over(w) != F.col("path"))
    ).filter(F.col("__first")).drop("__first")
    plan = plan_of(merged)
    assert plan.count("Exchange") == 1, plan


def test_wholestage_codegen_covers_flatten(spark):
    from tap_rest_api_msdk_spark.functions.flatten import flatten_dataframe
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.sources.reader import infer_payload_struct

    wal = synth_repo_wal(spark, 500, n_repos=3, n_paths=5)
    ps = infer_payload_struct(wal, "payload")
    flat = flatten_dataframe(wal, "payload", ps, keep_cols=["seq", "repo", "path"])
    plan = plan_of(flat)
    # "*(n)" marks WholeStageCodegen stages in the physical plan string
    assert "*(" in plan or "WholeStageCodegen" in plan


def test_round2_queries_python_free_and_shaped(spark):
    """Plan gates for the round-2 additions: portable-hash ops stay JVM
    native; the new relational shapes pick the right join strategies."""
    for name in ["ann_ivf_topk", "approx_distinct_users", "dedup_ngram_jaccard"]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, name
        assert "PythonUDF" not in plan, name

    # ann_lsh_topk's bucket stage is DELIBERATELY a vectorized Arrow kernel
    # (one int64 matmul for all T*P plane dots — 24x the interpreted
    # expression form); everything downstream (join, re-rank) stays native
    plan = plan_of(QUERIES["ann_lsh_topk"](spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python

    # Q4 shape plans as a semi join (no full join + dedup)
    plan = plan_of(QUERIES["order_priority_counts"](spark, SF_DIR))
    assert "LeftSemi" in plan, plan[:800]

    # Q14 dim join broadcasts (no SortMergeJoin for the small part table)
    plan = plan_of(QUERIES["promo_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    # HLL register extraction keeps a partial (map-side) aggregate
    plan = plan_of(QUERIES["approx_distinct_users"](spark, SF_DIR))
    assert "partial_max" in plan or "partial_" in plan


def test_asof_and_range_join_avoid_nested_loop(spark):
    """The as-of union+window and bucketed range join must never plan a
    per-key cross product (BroadcastNestedLoopJoin / CartesianProduct)."""
    for name in ["asof_join_signup", "range_join_clicks"]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, name
    # range join's equi-join keys include the time bucket
    plan = plan_of(QUERIES["range_join_clicks"](spark, SF_DIR))
    assert "__b" in plan


def test_round3_queries_python_free_and_shaped(spark):
    """Plan gates for the round-3 additions: sketches stay JVM-native with
    map-side partial aggregates; the containment join is an equi-join on
    the anchor shingle (never a cross product); the bloom probe broadcasts
    the filter."""
    for name in [
        "heavy_hitters_countmin",
        "bloom_filter_join",
        "dedup_contained",
        "sample_stratified",
        "text_repetition",
    ]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, name
        assert "CartesianProduct" not in plan, name
        if name != "bloom_filter_join":
            # bloom's FINAL step cross-combines three single-row aggregate
            # frames (1x1x1 BNLJ is the right plan there); every data-sized
            # join in it is gated below
            assert "BroadcastNestedLoopJoin" not in plan, name

    # count-min counters aggregate with a partial (map-side) phase
    plan = plan_of(QUERIES["heavy_hitters_countmin"](spark, SF_DIR))
    assert "partial_" in plan

    # the bloom filter SHIPS to the probe side
    plan = plan_of(QUERIES["bloom_filter_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan

    # stratified sampling is one partial-agg pass, no join at all
    plan = plan_of(QUERIES["sample_stratified"](spark, SF_DIR))
    assert "Join" not in plan and "partial_" in plan


def test_substring_dup_rate_no_corpus_self_join(spark):
    """r3 verdict item #1: the window table must come straight out of the
    explode projection (text carried in-row, windows pre-hashed) — no join
    back to documents on doc_id, and no 40-char string shuffle key."""
    plan = plan_of(QUERIES["substring_dup_rate"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # no join AT ALL: windows are pre-hashed in the explode projection and
    # the df flag is a count over the per-wh window partition
    assert "Join" not in plan, plan
    # one corpus scan, two exchanges (wh repartition + final doc_id agg)
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange hashpartitioning") == 2
    assert "xxhash64" in plan  # 8-byte shuffle key, not the 40-char window
    assert "partial_" in plan


def test_bm25_broadcasts_df_and_take_ordered(spark):
    """BM25: the 3-row per-term df table must broadcast (never shuffle
    the tf side on term), the top-k must be a TakeOrdered (sort-limit),
    and the hot path stays Python-free."""
    plan = plan_of(QUERIES["bm25_search"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrdered" in plan
    assert "CartesianProduct" not in plan


def test_chunk_windows_single_scan_no_shuffle(spark):
    """RAG chunking is embarrassingly parallel: one scan, the token array
    carried through the explode in-row — no join, no exchange, no
    Python."""
    plan = plan_of(QUERIES["chunk_windows"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert plan.count("FileScan") == 1


def test_char_entropy_no_join_single_scan(spark):
    """r7: char entropy is ONE Arrow-batched kernel over one scan — the
    per-doc reduction is doc-local, so there is no join, no window, no
    hash aggregate, and no exchange beyond spread_input's round-robin
    widener (row-at-a-time BatchEvalPython stays banned; MapInPandas is
    the Arrow path)."""
    plan = plan_of(QUERIES["text_char_entropy"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1
    assert "MapInPandas" in plan
    assert "HashAggregate" not in plan and "hashpartitioning" not in plan


def test_unigram_surprisal_join_free_shape(spark):
    """r4 verdict item #2: the corpus unigram table must NOT broadcast
    (vocabulary scales with the corpus — executor OOM at web scale) and
    must not join at all — p(tok) attaches via the count-window device:
    ONE token-stream scan, TWO exchanges, ZERO joins, no broadcast."""
    plan = plan_of(QUERIES["text_unigram_surprisal"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "Join" not in plan, plan
    assert "Broadcast" not in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_" in plan


def test_round4_new_queries_shaped(spark):
    """Round-4 additions: decontamination broadcasts the (hashed) eval-gram
    side; the quality scorer is one partial-agg pass with no join; the
    tolerance as-of never plans a per-key cross product."""
    plan = plan_of(QUERIES["decontaminate_ngram_overlap"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan
    assert "xxhash64" in plan  # grams ship as 8-byte hashes, not strings

    plan = plan_of(QUERIES["quality_linear_score"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # r7: the scorer is row-local array arithmetic — no join AND no
    # exchange at all (was: explode + partial/final aggregate)
    assert "Join" not in plan and "Exchange" not in plan

    plan = plan_of(QUERIES["asof_join_tolerance"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_decontaminate_join_strategy_switch(spark):
    """The decontamination operator's join strategy is size-aware: an
    eval side past the explicit broadcast budget (estimate mode, forced
    tiny here) must fall back to a shuffled join on the 8-byte gram hash
    — a forced broadcast of an oversized eval split would OOM every
    executor at 100 TB."""
    from tap_rest_api_msdk_spark.operators.decontaminate import (
        decontaminate_ngram_overlap,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # estimate mode with a 1-gram budget -> must pick the shuffled plan
    plan = plan_of(
        decontaminate_ngram_overlap(docs, join_mode="estimate",
                                    broadcast_max_grams=1)
    )
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    # the pinned shuffle query takes the same plan
    plan = plan_of(QUERIES["decontaminate_ngram_shuffle"](spark, SF_DIR))
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # and auto (unhinted) broadcasts at test scale via Catalyst's estimate
    plan = plan_of(QUERIES["decontaminate_ngram_overlap"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_quality_percentile_and_temperature_plans(spark):
    """The per-source percentile filter must not rank docs in per-source
    window partitions (a handful of giant partitions at 100 TB): the
    doc-side window is partitioned by (source, quality_score) — the
    source-only cumulative window runs over the tiny histogram — and the
    cutoff table broadcasts back. Temperature mixing broadcasts its
    per-source thresholds; both hot paths stay Python-free."""
    import re

    plan = plan_of(QUERIES["quality_percentile_filter"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan
    # the doc-side row_number partitions by (source, __q4, -> doc_id
    # order); __q4 is the exact-integer quantized score (r7), bijective
    # to quality_score, so the fine-grained-partition property is the same
    assert re.search(
        r"windowspecdefinition\(source#\d+, __q4#\d+L, doc_id", plan
    )

    plan = plan_of(QUERIES["sample_temperature"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan and "partial_" in plan
    assert "Window" not in plan  # no window at all: aggregates + broadcasts


def test_pack_funnel_retention_plans(spark):
    """Packing's prefix-sum windows by (source, shard) — never source
    alone (a single-partition running sum is the 100 TB anti-pattern);
    the funnel and retention queries stay Python-free with map-side
    partial aggregation and no cross products."""
    import re

    plan = plan_of(QUERIES["pack_sequences"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert re.search(r"windowspecdefinition\(source#\d+, shard#\d+", plan)

    for name in ("events_funnel", "retention_cohorts"):
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "partial_" in plan


def test_pii_scrub_is_projection_only(spark):
    """Redaction is one native projection: no UDF, no shuffle, no join."""
    plan = plan_of(QUERIES["pii_scrub"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_corpus_lm_queries_join_free_shape(spark):
    """The window-trick corpus-LM scorers (oov rate, bigram logprob) keep
    the substring_dup_rate shape: ONE corpus scan, TWO exchanges (the
    explicit token/prefix repartition whose hashpartitioning satisfies
    both downstream clusterings + the per-doc rollup), and ZERO joins —
    the corpus-wide model counts attach via count windows, never a join
    back to the token stream."""
    for name in ["text_oov_rate", "text_bigram_logprob", "line_dedup"]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, name
        assert "Join" not in plan, name
        assert plan.count("FileScan") == 1, name
        assert plan.count("Exchange hashpartitioning") == 2, name
        assert "partial_" in plan, name


def test_text_repetition_single_scan_no_shuffle(spark):
    """r6 session 5: the per-doc top-token count is row-local (max run in
    the sorted token array), so the whole query is ONE documents scan
    with ZERO joins and ZERO hash exchanges — the former
    explode -> groupBy -> groupBy -> join shuffled the token stream
    twice, which at web scale dwarfs the scan itself. Only the
    _spread round-robin exchange (narrow-input widening) is allowed."""
    plan = plan_of(QUERIES["text_repetition"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Generate explode" not in plan, plan
