"""Plans — table format, snapshot/commit protocol, plan inspection.

The reference delegates all state-keeping to ArangoDB collections +
primary-key indexes (/root/reference/src/handler/arangodb.rs:381-394,
:405-524). Here state lives in a snapshot-versioned parquet table with an
Iceberg-style commit protocol (atomic manifest swap, summary properties as
the batch-id fence) — the format is pluggable behind this module's API;
on a cluster with the iceberg-spark-runtime jar the same engine code
targets real Iceberg MERGE (SURVEY.md §7.0).
"""
