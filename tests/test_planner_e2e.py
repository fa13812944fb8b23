"""FX3 end-to-end: planner over on-disk page metadata -> micro-batch slices
-> replay -> lake table. Reproduces the reference's two-page sync golden
(/root/reference/tests/test_streams.py:108-135): page 1 carries
next_page=next_page_token, page 2 terminates; output = all 4 records,
page order preserved in seq.
"""

import json
import os

from pyspark.sql import functions as F

from tap_rest_api_msdk_spark.plans.planner import (
    get_planner,
    pages_to_slices,
    scan_wal_pages,
)
from tap_rest_api_msdk_spark.streaming.pipeline import PipelineConfig, run_batch_replay

# FX1 golden records (tests/test_streams.py:36-59), one page of two each
PAGE_RECORDS = [
    [
        {"key1": "this", "key2": "that", "key3": "foo", "field1": "I", "field2": None},
        {"key1": "foo", "key2": "bar", "key3": "spam", "field1": None, "field2": 8},
    ],
    [
        {"key1": "x", "key2": "y", "key3": "z", "field1": "J", "field2": None},
        {"key1": "a", "key2": "b", "key3": "c", "field1": None, "field2": 9},
    ],
]


def write_paged_wal(spark, wal_dir):
    os.makedirs(wal_dir)
    seq = 0
    for i, records in enumerate(PAGE_RECORDS):
        rows = []
        for rec in records:
            rows.append((seq, json.dumps(rec)))
            seq += 1
        df = spark.createDataFrame(rows, "seq long, payload string")
        import glob
        import shutil

        tmp = os.path.join(wal_dir, f".tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(wal_dir, f"page-{i:05d}.parquet"))
        shutil.rmtree(tmp)
        meta = {
            "n_records": len(records),
            # page 1 carries the continuation token; page 2 does not
            "body": {"next_page": "next_page_token"} if i == 0 else {},
            "seq_range": [seq - len(records) - 1, seq - 1],
        }
        with open(os.path.join(wal_dir, f"page-{i:05d}.meta.json"), "w") as fh:
            json.dump(meta, fh)


def test_two_page_sync_end_to_end(spark, tmp_path):
    wal_dir = str(tmp_path / "paged")
    write_paged_wal(spark, wal_dir)

    pages = scan_wal_pages(wal_dir)
    planned = get_planner("jsonpath_paginator")(iter(pages))  # default $.next_page
    assert [p.index for p in planned] == [0, 1]
    slices = pages_to_slices(planned)
    assert len(slices) == 2

    wal = spark.read.parquet(f"{wal_dir}/page-*.parquet")
    conf = PipelineConfig(
        stream="fx3",
        keys=["key1", "key2"],          # primary_keys (test_streams.py:25)
        replication_key="seq",
        order_by=["seq"],
        op_col=None,
        payload_col="payload",
        payload_schema=None,            # discovered (F4)
        ts_col=None,
    )
    table = run_batch_replay(spark, wal, str(tmp_path / "t"), conf, slices=slices)
    rows = table.to_df().orderBy("seq").collect()
    # exactly 4 records, in page order; flattened fields present
    assert len(rows) == 4
    assert [r.key1 for r in rows] == ["this", "foo", "x", "a"]
    assert rows[1].field2 == 8 and rows[0].field1 == "I"
    # two micro-batches committed (one per planned page)
    assert table.current_manifest()["batch_id"] == 1
    assert table.bookmarks()["fx3"] == 3


def test_early_stop_skips_unplanned_pages(spark, tmp_path):
    """single_page_paginator plans only page 0 -> page 1 never scanned."""
    wal_dir = str(tmp_path / "paged1")
    write_paged_wal(spark, wal_dir)
    pages = scan_wal_pages(wal_dir)
    planned = get_planner("single_page_paginator")(iter(pages))
    slices = pages_to_slices(planned)
    wal = spark.read.parquet(f"{wal_dir}/page-*.parquet")
    conf = PipelineConfig(
        stream="fx3", keys=["key1", "key2"], replication_key="seq",
        order_by=["seq"], op_col=None, payload_col="payload", ts_col=None,
    )
    table = run_batch_replay(spark, wal, str(tmp_path / "t1"), conf, slices=slices)
    assert table.to_df().count() == 2
    assert table.bookmarks()["fx3"] == 1
