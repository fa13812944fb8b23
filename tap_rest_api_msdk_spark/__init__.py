"""tap_rest_api_msdk_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the semantics of the Singer tap ``Widen/tap-rest-api-msdk``
(reference at /root/reference) as an idiomatic Spark pipeline:

- WAL-tail change events -> incremental (replication-key) filter ->
  vectorized nested-JSON flatten -> last-writer-wins dedup ->
  MERGE-upsert into a Parquet lake table with an atomic manifest commit
  (exactly-once via idempotent batch ids) and additive schema evolution.

Nothing here is a port: the reference's HTTP control plane maps onto
Spark source-offset planning; its data operators (flatten, inference,
bookmarks, pagination, dedup, limit) are re-implemented Spark-first.
"""

__version__ = "0.1.0"
