"""Streaming NET-changes surface: Structured Streaming over the
delta-walk ``cdc_diff`` (r4 lead #3).

The raw ``laketable_changes`` stream delivers the FILES added per commit
window — exact change rows under mor / cow_incremental, but whole-bucket
cow commits carry unchanged rows along, and consumers who want
row-level ``insert | update | delete`` with before/after images still
have to resolve LWW themselves. This module closes that gap: a
``foreachBatch`` pipeline where Spark's checkpointed offsets drive the
window and each micro-batch hands the sink the table's exact row-level
net diff for that window —

    stream_net_changes(table, apply_fn, checkpoint_dir)

``apply_fn(diff_df, batch_id, (from_v, to_v))`` receives the output of
``LakeTable.cdc_diff(from_v, to_v)``: one row per key whose live state
changed, ``change ∈ {insert, update, delete}``, ``before``/``after``
structs — the Iceberg create_changelog_view / Delta CDF-read analog,
computed by the delta-walk (O(changed granules), never O(table)).

Exactly-once contract (same as any foreachBatch sink): the micro-batch
window is pinned in an O(1) ledger file INSIDE the checkpoint directory
*before* the sink runs, so a crash-replayed batch re-presents the SAME
(from_v, to_v] window and ``cdc_diff`` — deterministic given its
endpoints — re-produces the same rows; an idempotent sink keyed on
batch_id converges. The ledger and the Spark offset checkpoint live
under one directory, so they can only be wiped together.

Window semantics: ``to_v`` is the latest DATA commit past the pinned
baseline at fire time (maintenance commits — folds, compactions — never
change live state, so a window that ends between a data commit and a
later fold diffs identically). Micro-batches whose window contains only
maintenance commits are skipped without advancing the ledger — windows
stay contiguous and gap-free over data commits.

Scale shape: the driver touches only manifests and the O(1) ledger; the
per-window work is the delta-walk read (touched granules' files);
the window end is resolved from manifest metadata, so the raw stream's
file partitions are never even read. Nothing here is O(table) or
O(history).

The reference tap has no changelog read surface (it emits records
forward-only, streams.py get_records); this is the engine extension
that makes the lake table a CDC *source*, not just a sink.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional



class _WindowLedger:
    """O(1) window pin for the net-changes stream: a single JSON file
    ``{batch_id, start, end}`` (tmp + atomic replace). Only the most
    recent micro-batch can be crash-replayed by Spark, so one record is
    the complete replay state."""

    def __init__(self, path: str):
        self.path = path

    def read(self) -> Optional[dict]:
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def write(self, batch_id: int, start: int, end: int,
              scanned_to: Optional[int] = None) -> None:
        """``scanned_to``: versions up to here are VERIFIED to contain no
        data commit past ``end`` — a monotonic cache that keeps repeated
        maintenance-only drains from re-walking the same manifests."""
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = f"{self.path}.tmp.{os.getpid()}"
        rec = {"batch_id": int(batch_id), "start": int(start),
               "end": int(end)}
        if scanned_to is not None:
            rec["scanned_to"] = int(scanned_to)
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, self.path)


def stream_net_changes(
    table,
    apply_fn: Callable,
    checkpoint_dir: str,
    starting_version: Optional[int] = None,
    await_termination: bool = True,
    processing_time: Optional[str] = None,
):
    """Run the table's row-level changelog through Structured Streaming:
    each micro-batch calls ``apply_fn(diff_df, batch_id, (from_v, to_v))``
    with the exact net diff of its commit window. Default trigger is
    ``availableNow``: drains to the current HEAD and stops (call again
    with the same ``checkpoint_dir`` to continue from where it left
    off). Pass ``processing_time`` (e.g. ``"1 second"``) for a LIVE
    tail that keeps polling the commit log — the returned
    StreamingQuery runs until ``.stop()`` (``await_termination`` is
    ignored; a live tail never terminates on its own).

    ``starting_version``: first window opens at this version (its state
    is the baseline; pass ``-1`` for all-history = initial snapshot as
    inserts, or a TAG NAME — 'changes since release-1'). Default: table
    HEAD at first call — only future commits stream. Ignored on resume
    (the checkpoint wins, as in any stream).
    """
    from tap_rest_api_msdk_spark.streaming.changes_source import (
        LakeTableChangesDataSource,
    )
    from tap_rest_api_msdk_spark.streaming.laketable import (
        head_version,
        walk_added_files,
    )

    spark = table.spark
    spark.dataSource.register(LakeTableChangesDataSource)
    ledger = _WindowLedger(os.path.join(checkpoint_dir, "net_window.json"))

    # seed the baseline ONCE, at first setup (batch_id=-1 sentinel): on
    # resume the ledger (like the Spark checkpoint) wins, so a drain that
    # saw no data commits still pins the original baseline — otherwise a
    # later call with the default start would re-resolve it at the NEW
    # head and silently skip the interim window. Seeding is gated on the
    # Spark checkpoint ALSO being absent: a lost ledger next to a
    # surviving offset checkpoint must fail loudly, not silently rebase
    # the diff baseline onto the current head. Tag names resolve ONLY at
    # seed time — on resume the value is ignored entirely (the docstring
    # contract), so dropping the tag later cannot break the stream.
    spark_ckpt = os.path.join(checkpoint_dir, "spark")
    seeded = ledger.read()
    if seeded is None:
        if os.path.exists(spark_ckpt):
            raise ValueError(
                f"net-changes window ledger missing under {checkpoint_dir!r} "
                "while the Spark offset checkpoint survives — wipe the "
                "checkpoint directory atomically, not piecemeal"
            )
        if starting_version is None:
            head = head_version(table.path)
            starting_version = head if head is not None else -1
        else:
            starting_version = table.resolve_version(starting_version)
        ledger.write(-1, starting_version, starting_version)
    else:
        # resume: pass a NUMERIC version to the source (never the tag
        # name — the tag may be gone); Spark's checkpoint wins anyway
        starting_version = seeded["start"]

    def fb(batch_df, batch_id: int):
        pinned = ledger.read()
        if pinned is None:
            raise ValueError(
                f"net-changes window ledger missing under {checkpoint_dir!r} "
                "while the Spark offset checkpoint survives — wipe the "
                "checkpoint directory atomically, not piecemeal"
            )
        if pinned["batch_id"] == batch_id:
            start, end = pinned["start"], pinned["end"]  # crash replay
        else:
            if pinned["batch_id"] > batch_id:
                raise ValueError(
                    f"net-changes ledger at batch {pinned['batch_id']} is "
                    f"ahead of Spark's micro-batch {batch_id}: the offset "
                    "checkpoint was reset without its window ledger — wipe "
                    f"{checkpoint_dir!r} atomically, not piecemeal"
                )
            # window end = latest DATA commit past the pinned baseline,
            # resolved DRIVER-SIDE from manifest metadata (O(commits in
            # window), zero data I/O) — aggregating the delivered rows
            # instead would re-read every added file just for a max().
            # batch_df is never acted on, so those reads never happen;
            # the stream is the checkpointed trigger, the manifests are
            # the truth. May run ahead of Spark's offset window if a
            # commit raced in — harmless: windows stay contiguous from
            # the pinned end, and the overtaken batch skips below.
            start = pinned["end"]  # ledger is always seeded at setup
            # resume the walk at the verified maintenance-only high-water
            # mark, not the diff baseline: a quiet table accumulating
            # folds/compactions would otherwise re-walk the same
            # ever-growing manifest range on every drain
            scan_from = max(start, pinned.get("scanned_to", start))
            head = head_version(table.path)
            added = (
                walk_added_files(table.path, scan_from, head)
                if head is not None and head > scan_from
                else []
            )
            if not added:
                if head is not None and head > scan_from:
                    # cache the verified-empty range; the PINNED window is
                    # preserved verbatim so a replay of that batch still
                    # re-presents its exact (start, end]
                    ledger.write(pinned["batch_id"], pinned["start"],
                                 pinned["end"], scanned_to=head)
                return  # maintenance-only window: live state unchanged
            end = max(v for _, v in added)
            ledger.write(batch_id, start, end)  # pin BEFORE the sink runs
        diff = table.cdc_diff(start, end)
        apply_fn(diff, batch_id, (start, end))

    writer = (
        spark.readStream.format("laketable_changes")
        .option("path", table.path)
        .option("starting_version", starting_version)
        .load()
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", spark_ckpt)
    )
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time).start()
    q = writer.trigger(availableNow=True).start()
    if await_termination:
        q.awaitTermination()
    return q
