"""Singer-protocol message sink: SCHEMA / RECORD / STATE JSONL.

The reference's OUTPUT is a Singer message stream on stdout
(**[inherited: singer-sdk]**, SURVEY §2.4: SCHEMA once, RECORD per row,
STATE periodically/at end; capabilities declared in
/root/reference/meltano.yml:8-11). This sink lets a downstream Singer
target consume this engine's batches unchanged — the final piece of "a
user of the reference could switch".

Message shapes follow the public Singer spec:

    {"type": "SCHEMA", "stream": s, "schema": {...}, "key_properties": [...],
     "bookmark_properties": [rk]}
    {"type": "RECORD", "stream": s, "record": {...}, "time_extracted": iso}
    {"type": "STATE", "value": {"bookmarks": {s: {"replication_key": rk,
                                                  "replication_key_value": v}}}}

Scale note: a message-per-row text stream is inherently a small-batch /
tail-consumer format (the reference emits one HTTP page at a time). The
distributed path writes RECORD lines as a parquet->jsonl export per
partition; the driver-side writer here is for bounded batches and tests.
"""

from __future__ import annotations

import datetime as dt
import json
from typing import IO, Optional, Sequence

from pyspark.sql import DataFrame

from tap_rest_api_msdk_spark.operators.incremental import serialize_bookmark

_SPARK_TO_JSON_TYPE = {
    "string": "string",
    "bigint": "integer",
    "int": "integer",
    "smallint": "integer",
    "tinyint": "integer",
    "double": "number",
    "float": "number",
    "boolean": "boolean",
    "timestamp": "string",
    "timestamp_ntz": "string",
    "date": "string",
}


def schema_message(
    stream: str,
    df: DataFrame,
    key_properties: Sequence[str],
    replication_key: Optional[str] = None,
) -> dict:
    props = {}
    for name, dtype in df.dtypes:
        jt = _SPARK_TO_JSON_TYPE.get(dtype, "string")
        props[name] = {"type": ["null", jt]}
    msg = {
        "type": "SCHEMA",
        "stream": stream,
        "schema": {"type": "object", "properties": props},
        "key_properties": list(key_properties),
    }
    if replication_key:
        msg["bookmark_properties"] = [replication_key]
    return msg


def state_message(stream: str, replication_key: str, value) -> dict:
    return {
        "type": "STATE",
        "value": {
            "bookmarks": {
                stream: {
                    "replication_key": replication_key,
                    "replication_key_value": serialize_bookmark(value),
                }
            }
        },
    }


def _json_default(v):
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return str(v)


def write_singer_messages(
    df: DataFrame,
    stream: str,
    key_properties: Sequence[str],
    replication_key: str,
    out: IO[str],
    time_extracted: Optional[str] = None,
) -> dict:
    """Emit SCHEMA -> RECORD* -> STATE for a bounded batch (driver-side).

    Returns a summary dict (counts + final bookmark). ``time_extracted``
    must be injected by the caller for determinism (no wall-clock reads
    inside the sink).
    """
    out.write(json.dumps(schema_message(stream, df, key_properties, replication_key)) + "\n")
    n = 0
    bookmark = None
    for row in df.toLocalIterator():
        rec = row.asDict(recursive=True)
        rk_val = rec.get(replication_key)
        if rk_val is not None and (bookmark is None or rk_val > bookmark):
            bookmark = rk_val
        msg = {"type": "RECORD", "stream": stream, "record":
               json.loads(json.dumps(rec, default=_json_default))}
        if time_extracted:
            msg["time_extracted"] = time_extracted
        out.write(json.dumps(msg) + "\n")
        n += 1
    out.write(json.dumps(state_message(stream, replication_key, bookmark)) + "\n")
    return {"records": n, "bookmark": bookmark}
