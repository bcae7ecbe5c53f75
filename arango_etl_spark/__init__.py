"""arango_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capabilities of ``novalabsxyz/arango-etl``
(reference at /root/reference, cited per-module as file:line), re-expressed
Spark-first:

- change-event log (insert/update/delete on doc_id-keyed rows) tailed as a
  Structured Streaming source (reference: S3 file tail,
  src/handler/arangodb_handler.rs:74-75),
- per-key dedup/ordering with last-writer-wins over (doc_id, seq_no)
  (reference: racy arrival-order UPSERT, src/handler/arangodb.rs:223-225),
- exactly-once MERGE upserts into a snapshot-versioned lakehouse table with
  batch-id fences recorded in the snapshot summary (reference: the `files`
  ledger `done` flag, src/document/iot_poc_file.rs:5-13),
- per-partition lineage counters + throughput metrics (reference: Redis
  XADD side channel, src/handler/redis_handler.rs:19-24).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from arango_etl_spark.session import get_spark  # noqa: F401
