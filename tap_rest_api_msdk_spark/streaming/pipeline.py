"""E2 analog — the engine's extract loop (SURVEY §3).

Reference loop: paginator -> request -> parse_response -> post_process ->
RECORD/STATE **[inherited: singer-sdk, §2.4]**. Spark loop (per micro-batch):

  scan WAL slice (start,end] -> filter(rk > bookmark) -> flatten(payload) ->
  within-batch LWW -> LakeTable.merge_upsert (idempotent batch id, bookmark
  + lineage committed atomically with the data)

Two drivers share the exact same batch processor:

* :func:`run_batch_replay` — deterministic replay over a WAL DataFrame in
  planner-supplied slices (tests, bench, and bootstrap/backfill).
* :func:`run_streaming` — ``readStream`` file source tailing the WAL dir +
  ``foreachBatch``; Spark's checkpoint supplies offsets, the manifest's
  batch-id ledger supplies idempotence.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tap_rest_api_msdk_spark.functions.flatten import flatten_dataframe
from tap_rest_api_msdk_spark.operators.incremental import incremental_filter
from tap_rest_api_msdk_spark.streaming.bookmarks import BookmarkStore
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
from tap_rest_api_msdk_spark.streaming.metrics import append_metrics_rows, lineage_metrics


# "auto" delta fan-out target (rows per delta file). 4096 puts the bench's
# 50k-row steady batches at ~13 files — the measured knee (16 files beat
# both 64 and 4 on the 30-batch steady shape; see delta_file_rows below).
DELTA_FILE_ROWS_AUTO = 4096


def _resolve_delta_file_rows(v) -> Optional[int]:
    if v is None:
        return None
    if v == "auto":
        return DELTA_FILE_ROWS_AUTO
    if isinstance(v, int) and v > 0:
        return v
    raise ValueError(f"delta_file_rows {v!r} (expected 'auto', a positive int, or None)")


@dataclass
class PipelineConfig:
    """Resolved engine config for one stream (F6 analog at the Spark layer)."""

    stream: str
    keys: Sequence[str] = ("repo", "path")
    replication_key: str = "seq"
    order_by: Sequence[str] = ("seq", "commit")  # deterministic LWW tie-break
    op_col: Optional[str] = "op"
    payload_col: Optional[str] = "payload"
    payload_schema: Optional[T.StructType] = None
    except_keys: list = field(default_factory=list)
    store_raw_json_message: bool = False
    start_date: Any = ""
    ts_col: Optional[str] = "ts"
    result_limit: Optional[int] = None
    num_buckets: int = 16
    # merge shuffle width = num_affected_buckets * files_per_bucket (None =
    # auto from cores): decouples write parallelism from the bucket layout
    files_per_bucket: Optional[int] = None
    # payload schema drift handling (FX6): "fixed" trusts the discovered
    # schema for the stream's lifetime (fastest; late-appearing fields are
    # dropped); "sample" re-samples N+1 payloads per batch and additively
    # merges the nested schema (catches fields that appear at batch
    # boundaries — the CDC evolution shape); "full" infers over the whole
    # batch via a JVM-native json read (exact, one extra parse pass).
    schema_evolution: str = "sample"
    inference_records: int = 50
    _schema_discovered: bool = False  # set by the pipeline on first inference
    # (touched_buckets, rows) of the last steady batch — sizes the next
    # batch's delta-write fan-out so its lineage pass can run CONCURRENTLY
    # with the write (perf hint only; claims stay exact). None = the next
    # delta batch runs sequentially and seeds it.
    _steady_est: Optional[tuple] = None
    # sink write strategy: "cow" rewrites affected buckets fully merged;
    # "mor" appends delta files (O(batch) writes) and resolves at read —
    # the steady-state streaming path. auto_compact_every folds MOR deltas
    # into a new base every N committed batches.
    # "cow_incremental" (DESIGN_hierarchical_bucketing.md) appends deltas
    # like MOR then folds the (bucket, slice) granules due this round —
    # amortized O(table/fold_every) rewrite per batch, delta chains bounded.
    sink_mode: str = "cow"
    auto_compact_every: Optional[int] = None
    # auto_compact_mode "full" rewrites the whole table (the pre-r4
    # behavior); "small_files" binpacks only fragmented buckets via
    # compact_buckets — the 100 TB-safe default shape, where maintenance
    # cost tracks fragmentation instead of table size
    auto_compact_mode: str = "full"
    auto_compact_small_file_bytes: int = 32 << 20
    auto_compact_min_input_files: int = 4
    fold_every: Optional[int] = None  # cow_incremental stagger (None = table default)
    # cow_incremental fold scheduling: "commits" (delta-chain length, the
    # Hudi NUM_COMMITS trigger) or "size" (LSM size-tiered: pending delta
    # bytes vs granule base bytes — cold granules with trivial-byte deltas
    # never rewrite under Zipf-skewed write patterns)
    fold_trigger: Optional[str] = None  # None = table default ("commits")
    fold_size_ratio: Optional[float] = None
    fold_min_bytes: Optional[int] = None
    # target rows per DELTA file for mor/cow_incremental micro-batches:
    # caps the delta write fan-out at ceil(batch_rows / this), writing
    # files SHARED across buckets (the claim format's collision case;
    # folds apportion shared-file bytes per claim). "auto" (the default)
    # targets DELTA_FILE_ROWS_AUTO rows/file — measured on the bench's
    # steady shape (30 x 50k-row batches into a 64-bucket 2.5M-key table,
    # local[32]): uncapped 25.6-27.6k ev/s vs capped-at-16-files
    # 35.3-35.7k (+30%, reproduced twice; fold batches FASTER too — fewer
    # pending files). At 1024+ buckets the gap is 2.9x (r6 bench leg): a
    # small batch would otherwise write num_buckets near-empty files
    # whose footers and commit latency dominate. Large batches are
    # unaffected (the cap only ever LOWERS the partition count below one
    # file per (bucket, salt)). None = uncapped, the pre-r5 layout; an
    # int = explicit rows-per-file target.
    delta_file_rows: Union[int, str, None] = "auto"
    # malformed payloads (unparseable JSON -> null struct after from_json):
    # "keep" emits all-null flattened fields (the tap's permissive shape),
    # "drop" filters them, "dlq" additionally lands the raw rows in a
    # dead-letter parquet dir under the table path for replay/inspection.
    malformed_policy: str = "keep"


def infer_json_schema_full(
    payloads: DataFrame,
    spill_dir: str,
    attempts: Sequence[str] = ("jvm", "rdd", "spill"),
) -> T.StructType:
    """Whole-batch JSON payload schema inference over a one-column
    ``value: string`` frame, trying in order:

    - ``jvm``: the Scala ``DataFrameReader.json(Dataset[String])`` overload
      via py4j — plan-only, no row crosses into Python (the fast path on
      classic sessions).
    - ``rdd``: ``spark.read.json(payloads.rdd.map(...))`` — classic
      sessions where the JVM handle is unavailable.
    - ``spill``: write the payloads as text under ``spill_dir`` and
      ``read.json`` the files — the only API shape Spark Connect supports
      (Connect has neither ``_jvm`` nor RDDs). ``spill_dir`` should sit on
      the lake table's storage, which is shared on a real cluster by
      construction; it is removed afterwards.

    ``attempts`` is exposed so tests can pin a specific path.
    """
    spark_ = payloads.sparkSession
    # null payloads carry no schema, and the RDD/JVM json readers would
    # surface them as a _corrupt_record column — drop them for every path
    payloads = payloads.filter(F.col("value").isNotNull())
    last_err: Exception | None = None
    for attempt in attempts:
        try:
            if attempt == "jvm":
                jvm = spark_._jvm
                jds = getattr(payloads._jdf, "as")(jvm.org.apache.spark.sql.Encoders.STRING())
                jschema = spark_._jsparkSession.read().json(jds).schema()
                return T._parse_datatype_json_string(jschema.json())
            if attempt == "rdd":
                return spark_.read.json(payloads.rdd.map(lambda r: r[0])).schema
            if attempt == "spill":
                payloads.filter(F.col("value").isNotNull()).write.mode("overwrite").text(spill_dir)
                try:
                    return spark_.read.json(spill_dir).schema
                finally:
                    import shutil

                    shutil.rmtree(spill_dir, ignore_errors=True)
        except Exception as e:  # try the next, less-capable API shape
            last_err = e
    raise RuntimeError(f"all schema-inference paths failed ({attempts})") from last_err


def prepare_batch(df: DataFrame, conf: PipelineConfig, bookmark: Any) -> DataFrame:
    """bookmark filter -> flatten: the record-shaping stage (F10 + F1)."""
    out = incremental_filter(df, conf.replication_key, bookmark)
    if conf.payload_col and conf.payload_schema is not None:
        keep = [c for c in df.columns if c != conf.payload_col]
        out = flatten_dataframe(
            out,
            conf.payload_col,
            conf.payload_schema,
            except_keys=conf.except_keys,
            keep_cols=keep,
            store_raw_json_message=conf.store_raw_json_message,
        )
    return out


class _EmptyBulkBatch(Exception):
    """Raised by the bulk-load path's lazy bookmark resolver when the
    lineage job reports ZERO rows — aborts merge_upsert between its write
    action and its CAS commit, so an empty first batch never commits a
    manifest or burns the writer's ledger slot (same outward behavior as
    the sequential path's early return)."""


def process_batch(
    table: LakeTable, conf: PipelineConfig, batch_df: DataFrame, batch_id: int
) -> dict:
    """One idempotent micro-batch commit (data + bookmarks + lineage)."""
    # batch-id ledger check FIRST: a replayed (already-committed) batch must
    # be a complete no-op — merge_upsert would skip it anyway, but side
    # channels (the DLQ append, metrics work) must not run twice either
    # the stream IS the writer: per-stream ledgers let several streams
    # share one table without suppressing each other's batch ids
    if batch_id <= table.last_batch_id_for(conf.stream):
        return {"skipped": True, "batch_id": batch_id}

    store = BookmarkStore(table, conf.stream, conf.start_date)
    bookmark = store.get()
    raw = incremental_filter(batch_df, conf.replication_key, bookmark)

    # F11 result cap across batches (pagination_results_limit): stop once
    # the table has committed `result_limit` records; a partial batch is
    # truncated deterministically by replication-key order
    # per-STREAM counter map (multi-writer safe: dict-valued extra keys
    # merge per entry on CAS rebase); legacy single-counter manifests
    # attribute their total to this stream
    _m = table.current_manifest() or {}
    _rc_by = _m.get("records_committed_by") or {}
    records_committed = _rc_by.get(
        conf.stream, 0 if _rc_by else _m.get("records_committed", 0)
    )
    if conf.result_limit is not None:
        remaining = conf.result_limit - records_committed
        if remaining <= 0:
            return {"skipped": True, "result_limit_reached": True, "batch_id": batch_id}
        from tap_rest_api_msdk_spark.operators.incremental import result_limit as _cap

        raw = _cap(raw.orderBy(conf.replication_key), remaining)

    # F4 dynamic discovery + drift handling: no schema supplied -> infer
    # from an N+1 sample (tap.py:557-640 analog); on later batches, merge
    # newly-observed payload fields additively per conf.schema_evolution
    # (the tap flattens drifting records dynamically, streams.py:588-603;
    # the lake sink then evolves the flat schema, SURVEY §4.2).
    payload_is_struct = bool(
        conf.payload_col
        and conf.payload_col in raw.columns
        and isinstance(raw.schema[conf.payload_col].dataType, T.StructType)
    )
    if payload_is_struct:
        # pre-shredded columnar WAL: the parquet schema IS the payload
        # schema — no inference pass, no JSON parse, no malformed handling
        # (shredding already happened at ingest). Drift arrives as parquet
        # schema evolution and merges additively like any other batch.
        from tap_rest_api_msdk_spark.functions.infer import merge_struct_types

        observed = raw.schema[conf.payload_col].dataType
        conf.payload_schema = (
            observed
            if conf.payload_schema is None
            else merge_struct_types(conf.payload_schema, observed)
        )
        conf._schema_discovered = True
    elif conf.payload_col:
        from tap_rest_api_msdk_spark.functions.infer import merge_struct_types
        from tap_rest_api_msdk_spark.sources.reader import infer_payload_struct

        # a user-SUPPLIED schema (F5 file/inline bypass) stays fixed, like
        # the reference's no-discovery path; only discovered schemas track
        # drift across batches
        def _infer_full():
            payloads = raw.select(F.col(conf.payload_col).cast("string").alias("value"))
            spill = os.path.join(table.path, "_tmp_infer", f"batch_id={batch_id}")
            return infer_json_schema_full(payloads, spill)

        observed = None
        if conf.payload_schema is None or (
            conf._schema_discovered and conf.schema_evolution in ("sample", "full")
        ):
            if conf.schema_evolution == "full":
                observed = _infer_full()
            else:
                observed = infer_payload_struct(raw, conf.payload_col, conf.inference_records)
            conf._schema_discovered = True
        if observed is not None and observed.fields:
            if conf.payload_schema is None:
                conf.payload_schema = observed
            else:
                conf.payload_schema = merge_struct_types(conf.payload_schema, observed)
        if conf.payload_schema is None or not conf.payload_schema.fields:
            return {"skipped": True, "empty": True, "batch_id": batch_id}

        if conf.malformed_policy in ("drop", "dlq"):
            # PERMISSIVE from_json yields a struct of nulls on bad input;
            # the standard detector is the corrupt-record column
            probe_schema = T.StructType(
                list(conf.payload_schema.fields)
                + [T.StructField("_corrupt_record", T.StringType(), True)]
            )
            parsed = F.from_json(
                F.col(conf.payload_col),
                probe_schema,
                {"columnNameOfCorruptRecord": "_corrupt_record"},
            )
            ok = parsed["_corrupt_record"].isNull() | F.col(conf.payload_col).isNull()
            if conf.malformed_policy == "dlq":
                # overwrite into the per-batch dir (plus the ledger check
                # above): DLQ landing is idempotent under crash-replay
                raw.filter(~ok).write.mode("overwrite").parquet(
                    os.path.join(table.path, "dlq", f"batch_id={batch_id}")
                )
            raw = raw.filter(ok)

    # lineage + high-watermark + affected buckets in ONE cheap pass over the
    # RAW batch (merge keys / seq / ts / payload are all pre-flatten
    # columns, so this pass never parses JSON). The flatten then runs
    # exactly once, inside the merge write action — measured 2x replay
    # throughput vs persisting the flattened batch across both passes.
    # Record-shaped streams whose keys live INSIDE the payload fall back to
    # metrics over the flattened batch (pays one extra JSON pass).
    # table.num_buckets is manifest-authoritative (a reopened table keeps
    # its committed bucket count even if conf disagrees)
    bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in conf.keys]), F.lit(table.num_buckets)
    ).cast("int")
    metrics_src = (
        raw if all(k in raw.columns for k in conf.keys) else prepare_batch(raw, conf, None)
    )
    # for COW sinks, ALSO collect the (bucket, slice64) footprint in the
    # same aggregate: merge_upsert then rewrites only the touched granules
    # ((bucket, slice)-granular COW) instead of whole buckets, at zero
    # extra scan cost. The footprint MUST be exact (claims derive from
    # it), which holds because metrics_src carries the same key values as
    # the shaped batch and runs after malformed/result-limit filtering.
    # BULK LOAD (first commit into an empty table): granule claims are
    # meaningless with no existing files, so the footprint is skipped and
    # the lineage job runs CONCURRENTLY with the merge write (below) —
    # the metrics scan is bandwidth-bound and leaves cores idle that the
    # compute-bound merge fills (measured ~1.3x on the 64M-event replay).
    bulk = not _m
    want_granular = conf.sink_mode == "cow" and not bulk
    src = metrics_src.withColumn("__p", bucket)
    if want_granular:
        from tap_rest_api_msdk_spark.streaming.laketable import SLICE_MOD

        src = src.withColumn(
            "__s64",
            F.pmod(
                F.xxhash64(*[F.col(k) for k in conf.keys], F.lit("__salt__")),
                F.lit(SLICE_MOD),
            ).cast("int"),
        )
    metrics_df = lineage_metrics(
        src,
        "__p",
        conf.replication_key,
        ts_col=conf.ts_col if conf.ts_col in metrics_src.columns else None,
        # byte accounting only applies to string payloads; a shredded
        # struct has no single serialized length
        bytes_col=(
            conf.payload_col
            if conf.payload_col in metrics_src.columns and not payload_is_struct
            else None
        ),
        slice_col="__s64" if want_granular else None,
    )
    shaped = prepare_batch(raw, conf, None)  # bookmark already applied
    if conf.fold_every:
        table.fold_every = conf.fold_every
    if conf.fold_trigger:
        table.fold_trigger = conf.fold_trigger
    if conf.fold_size_ratio is not None:
        table.fold_size_ratio = conf.fold_size_ratio
    if conf.fold_min_bytes is not None:
        table.fold_min_bytes = conf.fold_min_bytes

    # steady-overlap eligibility: delta-append modes never read the base,
    # so the ONLY pre-write input the lineage pass feeds is fan-out sizing
    # (S, k_parts, delta_parts) — estimable from the PREVIOUS batch of a
    # stationary CDC stream. The first steady batch runs sequentially (and
    # seeds the estimate); later batches run the lineage aggregate
    # concurrently with the delta write, like the bulk path. COW stays
    # sequential: its merge plan consumes the exact (bucket, slice)
    # footprint up front.
    overlap = (
        not bulk
        and conf.sink_mode in ("mor", "cow_incremental")
        and conf._steady_est is not None
    )
    if bulk or overlap:
        # ---- overlapped fast path: ONE wall-clock pass instead of two.
        # The lineage aggregate runs in a background thread while the
        # merge computes and writes; the commit payloads (bookmarks,
        # records_committed, affected buckets) are passed as MEMOIZED
        # CALLABLES that laketable resolves after the write action and
        # immediately before the CAS commit — exact bookmarks still land
        # in the same atomic manifest. An empty batch aborts via
        # _EmptyBulkBatch before anything commits (no ledger slot burned,
        # the orphan epoch dir reclaimed), preserving the sequential
        # path's semantics.
        import threading

        box: dict = {}

        def _collect_metrics():
            try:
                box["rows"] = metrics_df.collect()
            except BaseException as e:  # re-raised on join
                box["err"] = e

        th = threading.Thread(target=_collect_metrics, daemon=True)
        th.start()

        def _mrows():
            if "rows" not in box and "err" not in box:
                th.join()
            if "err" in box:
                raise box["err"]
            return box["rows"]

        def _bookmarks():
            rows = _mrows()
            if not rows:
                raise _EmptyBulkBatch()
            hw_ = max(r["max_replication_key"] for r in rows)
            return store.updates_for(
                hw_, {r["partition_id"]: r["max_replication_key"] for r in rows}
            )

        def _extra():
            n = sum(r["event_count"] for r in _mrows())
            return {
                "records_committed": records_committed + n,
                "records_committed_by": {conf.stream: records_committed + n},
            }

        mu_kwargs: dict = {}
        if overlap:
            # exact touched-bucket set, resolved by laketable AFTER the
            # delta write (claims enumeration); estimates size the fan-out
            def _affected():
                rows = _mrows()
                if not rows:
                    raise _EmptyBulkBatch()
                return sorted({int(r["partition_id"]) for r in rows})

            est_aff, est_rows = conf._steady_est
            dfr = _resolve_delta_file_rows(conf.delta_file_rows)
            mu_kwargs = {
                "affected_buckets": _affected,
                "affected_est": est_aff,
                "delta_parts": -(-est_rows // dfr) if dfr else None,
            }

        try:
            stats = table.merge_upsert(
                shaped,
                keys=conf.keys,
                order_by=conf.order_by,
                batch_id=batch_id,
                op_col=conf.op_col,
                bookmark_updates=_bookmarks,
                extra_manifest=_extra,
                mode=conf.sink_mode,
                writer_id=conf.stream,
                **mu_kwargs,
            )
        except _EmptyBulkBatch:
            return {"skipped": True, "empty": True, "batch_id": batch_id}
        mrows = _mrows()
        if not mrows:  # merge skipped before resolving (e.g. ledger race)
            return {"skipped": True, "empty": True, "batch_id": batch_id}
        hw = max(r["max_replication_key"] for r in mrows)
        if overlap:
            conf._steady_est = (
                len({r["partition_id"] for r in mrows}),
                sum(r["event_count"] for r in mrows),
            )
    else:
        mrows = metrics_df.collect()
        if not mrows:
            return {"skipped": True, "empty": True, "batch_id": batch_id}
        hw = max(r["max_replication_key"] for r in mrows)
        per_part = {r["partition_id"]: r["max_replication_key"] for r in mrows}
        foot = (
            {int(r["partition_id"]): set(r["slice_classes"]) for r in mrows}
            if want_granular
            else None
        )
        batch_rows = sum(r["event_count"] for r in mrows)
        dfr = _resolve_delta_file_rows(conf.delta_file_rows)
        delta_parts = (
            -(-batch_rows // dfr)
            if dfr and conf.sink_mode in ("mor", "cow_incremental")
            else None
        )
        stats = table.merge_upsert(
            shaped,
            keys=conf.keys,
            order_by=conf.order_by,
            batch_id=batch_id,
            op_col=conf.op_col,
            bookmark_updates=store.updates_for(hw, per_part),
            extra_manifest={
                "records_committed": records_committed + batch_rows,
                "records_committed_by": {
                    conf.stream: records_committed + batch_rows
                },
            },
            affected_buckets=sorted(per_part),  # lineage partition == merge bucket
            affected_granules=foot,
            mode=conf.sink_mode,
            writer_id=conf.stream,
            delta_parts=delta_parts,
        )
        if conf.sink_mode in ("mor", "cow_incremental"):
            # seed the steady-overlap fan-out estimate: the NEXT batch's
            # lineage pass runs concurrently with its delta write
            conf._steady_est = (len(per_part), batch_rows)
    if (
        not stats.get("skipped")
        and conf.sink_mode == "mor"
        and conf.auto_compact_every
        and (batch_id + 1) % conf.auto_compact_every == 0
    ):
        if conf.auto_compact_mode not in ("full", "small_files"):
            # a typo must not silently fall through to the O(table)
            # full rewrite the small_files mode exists to avoid
            raise ValueError(
                f"auto_compact_mode {conf.auto_compact_mode!r} "
                "(expected 'full' or 'small_files')"
            )
        stats["compaction"] = (
            table.compact_buckets(
                small_file_bytes=conf.auto_compact_small_file_bytes,
                min_input_files=conf.auto_compact_min_input_files,
            )
            if conf.auto_compact_mode == "small_files"
            else table.compact()
        )
    if not stats.get("skipped"):
        # metrics rows were already collected; append driver-side (pyarrow).
        # slice_classes is merge-plan plumbing, not lineage — keep the
        # persisted metrics schema stable across sink modes
        persisted = T.StructType(
            [f for f in metrics_df.schema.fields if f.name != "slice_classes"]
        )
        append_metrics_rows(mrows, persisted, table.path, batch_id, conf.stream)
    stats["rows_high_watermark"] = hw
    return stats


def run_batch_replay(
    spark: SparkSession,
    wal_df: DataFrame,
    table_path: str,
    conf: PipelineConfig,
    slices: Optional[Sequence[tuple]] = None,
    start_batch_id: int = 0,
) -> LakeTable:
    """Replay a bounded WAL through the same batch processor.

    ``slices`` — optional list of (start_seq, end_seq] ranges from the
    offset planner (plans/planner.py); default = one batch for the lot.
    """
    table = LakeTable(
        spark, table_path, num_buckets=conf.num_buckets,
        files_per_bucket=conf.files_per_bucket,
    )
    rk = conf.replication_key
    if slices is None:
        process_batch(table, conf, wal_df, start_batch_id)
        return table
    for i, (s, e) in enumerate(slices):
        sl = wal_df.filter((F.col(rk) > F.lit(s)) & (F.col(rk) <= F.lit(e)))
        process_batch(table, conf, sl, start_batch_id + i)
    return table


def run_streaming(
    spark: SparkSession,
    wal_dir: str,
    wal_schema: T.StructType,
    table_path: str,
    conf: PipelineConfig,
    checkpoint_dir: Optional[str] = None,
    max_files_per_trigger: Optional[int] = 1,
    available_now: bool = True,
    block: bool = True,
):
    """Tail the WAL directory with a file-streaming source.

    ``maxFilesPerTrigger`` is the engine's ``pagination_page_size``
    (SURVEY §1.1); ``Trigger.AvailableNow`` drains the backlog then stops
    (the P7 single-page one-shot analog) — set ``available_now=False`` for
    a continuously-running tail. ``block=False`` returns immediately after
    ``start()`` so several availableNow drains can run CONCURRENTLY (the
    caller awaits each query; orchestrate.start_all does exactly this).
    """
    table = LakeTable(
        spark, table_path, num_buckets=conf.num_buckets,
        files_per_bucket=conf.files_per_bucket,
    )
    reader = spark.readStream.schema(wal_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(wal_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(table, conf, batch_df, batch_id)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir or os.path.join(table_path, "_checkpoint")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        if block:
            q.awaitTermination()
        return table, q
    return table, writer.start()
