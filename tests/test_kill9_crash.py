"""Hard-crash safety: SIGKILL a replay subprocess mid-run; the table must
stay readable at its last committed snapshot and a resumed replay must
reconverge to the oracle (atomic manifest commit under real process death,
not just logical restarts)."""

import json
import os
import signal
import subprocess
import sys
import time

import duckdb
import pytest
from pyspark.sql import functions as F

N = 60_000

WORKER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from tap_rest_api_msdk_spark.session import get_spark
from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch
from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
from pyspark.sql import functions as F

spark = get_spark("kill9-worker", cores=4, shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
wal = spark.read.parquet({wal!r})
table = LakeTable(spark, {table!r}, num_buckets=8)
conf = PipelineConfig(stream="k9", payload_col="payload", num_buckets=8)
n = {n}
for i in range(12):
    s = -1 if i == 0 else n * i // 12
    e = n * (i + 1) // 12
    process_batch(table, conf, wal.filter((F.col("seq") > s) & (F.col("seq") <= e)), i)
    print("COMMITTED", i, flush=True)
print("DONE", flush=True)
"""


def test_sigkill_mid_replay_table_survives(spark, tmp_path):
    from tap_rest_api_msdk_spark.sources.wal_synth import synth_repo_wal
    from tap_rest_api_msdk_spark.streaming.laketable import LakeTable
    from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, process_batch

    wal_dir = str(tmp_path / "wal")
    synth_repo_wal(spark, N, n_repos=10, n_paths=50).write.parquet(wal_dir)
    table_dir = str(tmp_path / "t")

    script = WORKER.format(
        repo=os.path.abspath("."), wal=wal_dir, table=table_dir, n=N
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    committed = -1
    # let a few batches commit, then SIGKILL between/mid commits
    for line in proc.stdout:
        if line.startswith("COMMITTED"):
            committed = int(line.split()[1])
            if committed >= 3:
                break
        if line.startswith("DONE"):
            break
    time.sleep(0.05)  # land the kill inside the NEXT batch's work
    proc.kill()
    proc.wait()

    # the table opens cleanly at its last committed snapshot
    table = LakeTable(spark, table_dir, num_buckets=8)
    m = table.current_manifest()
    assert m is not None and m["batch_id"] >= committed
    mid_state = table.to_df().count()
    assert mid_state > 0

    # resume the remaining batches in-process (same batch-id schedule)
    wal = spark.read.parquet(wal_dir)
    conf = PipelineConfig(stream="k9", payload_col="payload", num_buckets=8)
    for i in range(12):
        s = -1 if i == 0 else N * i // 12
        e = N * (i + 1) // 12
        process_batch(
            table, conf, wal.filter((F.col("seq") > s) & (F.col("seq") <= e)), i
        )

    con = duckdb.connect()
    con.sql(f"create view wal as select * from read_parquet('{wal_dir}/*.parquet')")
    want = con.sql(
        """
        with ranked as (select *, row_number() over (
            partition by repo, path order by seq desc, commit desc) rn from wal)
        select count(*) from ranked where rn = 1 and op <> 'delete'
        """
    ).fetchone()[0]
    assert table.to_df().count() == want
    assert table.bookmarks()["k9"] == N - 1
