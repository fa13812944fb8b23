"""End-to-end migration story: WAL -> pipeline (exactly-once lake
upserts) -> streaming NET-changes -> Singer SCHEMA/RECORD/STATE export
per window -> a Singer-consuming replica reconstructs the table. This is
the reference's output contract (Singer messages, SURVEY §2.4) fed by
the engine's CDC surfaces end to end."""

from __future__ import annotations

import io
import json

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
from tap_rest_api_msdk_spark.streaming.net_changes import stream_net_changes
from tap_rest_api_msdk_spark.streaming.pipeline import (
    PipelineConfig,
    process_batch,
)
from tap_rest_api_msdk_spark.streaming.singer_sink import write_singer_messages


def test_wal_to_singer_changelog_roundtrip(spark, tmp_path):
    N = 2000
    wal = synth_repo_wal(spark, N, n_repos=8, n_paths=30, delete_mod=15,
                         shredded=True).cache()
    wal.count()
    table = LakeTable(spark, str(tmp_path / "tbl"), num_buckets=8)
    conf = PipelineConfig(stream="repo_files", payload_col="payload",
                          num_buckets=8, sink_mode="mor")
    lines: list[str] = []

    def export(diff, batch_id, window):
        # CDC-over-Singer: each record carries its change type; `after`
        # is flattened so a plain Singer target lands typed columns
        flat = diff.select(
            "repo", "path", "change",
            F.col("after.seq").alias("seq"),
            F.col("after.commit").alias("commit"),
        )
        buf = io.StringIO()
        summary = write_singer_messages(
            flat, "repo_files", ["repo", "path"], "seq", buf,
            time_extracted=f"2026-01-01T00:00:{batch_id:02d}Z",
        )
        assert summary["records"] == flat.count()
        lines.extend(buf.getvalue().splitlines())

    for i, (s, e) in enumerate([(-1, 700), (700, 1400), (1400, N)]):
        batch = wal.filter((F.col("seq") > s) & (F.col("seq") <= e))
        process_batch(table, conf, batch, i)
        stream_net_changes(table, export, str(tmp_path / "ckpt"),
                           starting_version=-1)

    msgs = [json.loads(ln) for ln in lines]
    # protocol shape: each window emits SCHEMA -> RECORD* -> STATE
    assert msgs[0]["type"] == "SCHEMA"
    assert msgs[0]["key_properties"] == ["repo", "path"]
    assert msgs[-1]["type"] == "STATE"
    # STATE bookmarks advance monotonically across windows
    marks = [
        m["value"]["bookmarks"]["repo_files"]["replication_key_value"]
        for m in msgs if m["type"] == "STATE"
    ]
    # the final bookmark tracks the max seq of UPSERT records — a
    # trailing tombstone (null after) rightly doesn't advance it
    assert marks == sorted(marks) and N - 15 <= marks[-1] <= N

    # a Singer consumer applying the changelog reconstructs the table
    replica = {}
    for m in msgs:
        if m["type"] != "RECORD":
            continue
        rec = m["record"]
        k = (rec["repo"], rec["path"])
        if rec["change"] == "delete":
            replica.pop(k, None)
        else:
            replica[k] = (rec["seq"], rec["commit"])
    live = {
        (r["repo"], r["path"]): (r["seq"], r["commit"])
        for r in table.to_df().select("repo", "path", "seq", "commit").collect()
    }
    assert replica == live
