"""Multi-stream orchestration — the engine's Tap.sync_all analog.

The reference loops its configured streams sequentially inside one process
(**[inherited: singer-sdk Tap.sync_all]**, SURVEY §2.4; streams are
independent, tap.py:454-553). Spark-side, each stream is its own
lake-table pipeline; they can run:

* sequentially (``run_all`` batch mode — deterministic, test-friendly), or
* concurrently as independent StreamingQueries sharing one SparkSession
  (``start_all`` — the scheduler interleaves them; each has its own
  checkpoint + manifest, so failure isolation matches the tap's
  per-stream independence).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

from tap_rest_api_msdk_spark.bridge import build_pipelines
from tap_rest_api_msdk_spark.streaming.pipeline import run_batch_replay, run_streaming


def run_all(
    spark: SparkSession,
    tap_config: dict,
    wal_dirs: dict,
    table_root: str,
) -> dict:
    """Batch-replay every configured stream; returns {stream: LakeTable}."""
    tables = {}
    for stream, conf, _planner in build_pipelines(tap_config):
        wal = spark.read.parquet(wal_dirs[stream.name])
        tables[stream.name] = run_batch_replay(
            spark, wal, os.path.join(table_root, stream.name), conf
        )
    return tables


def start_all(
    spark: SparkSession,
    tap_config: dict,
    wal_dirs: dict,
    table_root: str,
    max_files_per_trigger: Optional[int] = 4,
    available_now: bool = True,
) -> dict:
    """Start one streaming query per stream (concurrent tails).

    ``available_now=True`` starts every stream with a non-blocking
    ``Trigger.AvailableNow`` — Spark's scheduler interleaves the drains —
    then ``awaitTermination`` on each: the trigger self-terminates once the
    backlog is consumed, so there is no polling loop. ``available_now=
    False`` leaves continuous tails running (caller owns their lifecycle).
    """
    out = {}
    queries = []
    for stream, conf, _planner in build_pipelines(tap_config):
        wal_dir = wal_dirs[stream.name]
        schema = spark.read.parquet(wal_dir).schema
        table, q = run_streaming(
            spark,
            wal_dir,
            schema,
            os.path.join(table_root, stream.name),
            conf,
            checkpoint_dir=os.path.join(table_root, stream.name, "_checkpoint"),
            max_files_per_trigger=max_files_per_trigger,
            available_now=available_now,
            block=False,  # start all first; drain concurrently below
        )
        out[stream.name] = table
        queries.append(q)
    if available_now:
        for q in queries:
            q.awaitTermination()  # availableNow self-terminates when drained
    return out
