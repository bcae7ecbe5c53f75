"""Sources — the change-event log (SURVEY.md §2.1, S1–S5).

The reference tails an S3 bucket of protobuf files
(/root/reference/src/handler/arangodb_handler.rs:74-75, :281-294); here the
change stream is a deterministic synthetic CDC log materialized as
parquet — read whole (batch replay) or tailed incrementally
(Structured Streaming file source, one batch dir per micro-batch).
"""
