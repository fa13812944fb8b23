"""Benchmark decontamination (13-gram-collision rule) with a
scale-aware join strategy.

The reference tap has no decontamination (it delegates all transforms to
Singer targets, tap.py:66-70); this is an engine extension for the
LLM-training-data pipeline surface.

The operator marks every TRAIN document with how many of its distinct
n-token shingles collide with the gram set of a held-out EVAL split.
Grams are hashed to 8 bytes (``xxhash64``) before they ever leave their
row, so neither join side shuffles gram *strings*.

Join strategy — the 100 TB concern. A real benchmark set is small by
construction, so the eval-gram side normally BROADCASTS and the train
side never shuffles at all. But "eval" is a user-supplied predicate;
nothing guarantees it selects a broadcastable set (a 1 % split of
100 TB is 1 TB), and a hard-coded broadcast hint would OOM every
executor. Four modes:

* ``auto`` (default) — no hint: Catalyst's static size estimate picks
  the strategy and AQE re-validates against the ACTUAL built size at
  runtime. Zero extra passes; this is the idiomatic Spark answer, and
  at 100 TB the statistics make the oversized-broadcast guess
  impossible.
* ``estimate`` — pre-sizes the eval side with an explicit UPPER BOUND
  (one aggregate computing ``sum(token_count - n + 1)``; the distinct
  gram count can never exceed it) and picks broadcast vs shuffle
  against ``broadcast_max_grams``. A hard guarantee independent of
  Catalyst statistics — at the cost of one eager pass over the corpus'
  (id, text) columns to evaluate the eval predicate (the predicate is
  arbitrary, so it cannot be pruned to the eval rows without a
  pre-materialized split).
* ``broadcast`` — force the hint (caller knows the eval side is small).
* ``shuffle`` — force the scalable plan: a shuffled HASH join on the
  8-byte gram hash with the eval side as build (pinned via the
  ``shuffle_hash`` hint so small-scale statistics can't flip it back
  to broadcast). The inverted-index shape: both sides hash-partition
  on the gram hash, skew bounded by gram frequency, no sort.

Every mode produces identical results (same oracle SQL).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    """THE tokenization both the gram computation and the estimate-mode
    size bound share — the bound 'distinct grams <= sum(tokens - n + 1)'
    is only valid if both tokenize identically, so there is one copy."""
    return F.split(F.lower(F.trim(text)), "\\s+")


def ngram_hash_grams(text: Column, n: int = 13) -> Column:
    """All n-token shingles of whitespace-tokenized lowercased ``text``,
    each hashed to a bigint with ``xxhash64`` — pure JVM expression, no
    Python, no gram strings leaving the row. Docs shorter than ``n``
    tokens yield an empty array."""
    tokens = _tokens(text)
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, n))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _eval_gram_upper_bound(eval_docs: DataFrame, text_col: str, n: int) -> int:
    """Driver-side upper bound on the eval split's distinct-gram count:
    a doc with t tokens has at most t - n + 1 grams, so one aggregate
    over the filtered eval side bounds the build size of the probe."""
    tokens = _tokens(F.col(text_col))
    row = eval_docs.select(
        F.coalesce(
            F.sum(F.greatest(F.size(tokens) - (n - 1), F.lit(0))), F.lit(0)
        ).alias("g")
    ).first()
    return int(row["g"])


def decontaminate_ngram_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    eval_pred: Optional[Column] = None,
    join_mode: str = "auto",
    broadcast_max_grams: Optional[int] = None,
) -> DataFrame:
    """Per TRAIN doc: distinct n-gram count, how many collide with the
    EVAL split's gram set, and a contaminated flag.

    ``eval_pred`` selects the eval split (default ``id_col % 20 == 0``,
    portable to the SQL oracle). ``join_mode``: see module docstring.
    Passing an explicit ``broadcast_max_grams`` is a request for the HARD
    size guarantee, so it upgrades ``auto`` to ``estimate`` (a silently
    ignored budget would let a misestimated eval side broadcast past the
    caller's cap); ``estimate`` without a budget defaults to 2M grams.
    """
    if join_mode not in ("auto", "estimate", "broadcast", "shuffle"):
        raise ValueError(
            f"join_mode must be auto|estimate|broadcast|shuffle, got {join_mode!r}"
        )
    if join_mode == "auto" and broadcast_max_grams is not None:
        join_mode = "estimate"
    if broadcast_max_grams is None:
        broadcast_max_grams = 2_000_000
    if eval_pred is None:
        eval_pred = F.col(id_col) % 20 == 0

    from tap_rest_api_msdk_spark.operators.neardup import spread_input

    grams = ngram_hash_grams(F.col(text_col), n)
    # spread BEFORE the gram explode: on a narrow (few-split) input the
    # explode runs in the scan stage at split-count parallelism
    docs_w = spread_input(docs)
    eval_docs = docs_w.filter(eval_pred)
    # r7: dedupe grams INSIDE the row (array_distinct) before exploding.
    # A doc's grams all live in its own array, so per-doc distinct ==
    # distinct over the exploded (id, g) rows — the former .distinct()
    # on the train side was a full shuffle+sort of the exploded gram
    # stream (|docs| * |grams/doc| rows) that row-local dedup makes free
    # (guide §2.4). The eval side still needs the CROSS-doc distinct
    # (duplicate probe rows would double-count collisions on the join),
    # but the row-local pass shrinks what that exchange carries.
    eval_g = eval_docs.select(
        F.explode(F.array_distinct(grams)).alias("g")
    ).distinct()
    train_g = docs_w.filter(~eval_pred).select(
        id_col, F.explode_outer(F.array_distinct(grams)).alias("g")
    )

    mode = join_mode
    if mode == "estimate":
        bound = _eval_gram_upper_bound(eval_docs, text_col, n)
        mode = "broadcast" if bound <= broadcast_max_grams else "shuffle"

    probe = eval_g.withColumn("__hit", F.lit(1))
    if mode == "broadcast":
        probe = F.broadcast(probe)
    elif mode == "shuffle":
        probe = probe.hint("shuffle_hash")
    hits = train_g.join(probe, "g", "left")

    return (
        hits.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0)).alias("n_grams"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0)).alias(
                "n_contaminated"
            ),
        )
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") > 0).alias("contaminated"),
        )
    )
