"""Event-time windowed stream aggregations with watermarks.

The reference has no event-time windowing (state lives in its sink,
SURVEY.md §2.8) — this is the beyond-reference observability surface:
per-window ingest metrics (event counts, op mix, distinct-doc estimates,
max seq_no lag cursor) computed ON the change stream itself with late-data
tolerance, feeding dashboards without touching the merge path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_metrics(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling event-time windows over the change stream (works on both
    batch and streaming DataFrames; in streaming the watermark bounds
    state and tolerates late events up to `watermark`)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("event_ts", watermark)
    return (
        src.groupBy(F.window("event_ts", window).alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("doc_id").alias("approx_docs"),
            F.max("seq_no").alias("max_seq_no"),
            F.sum(F.coalesce("n_tok", F.lit(0))).alias("total_tokens"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op", "n_events", "approx_docs", "max_seq_no", "total_tokens",
        )
    )


def session_metrics(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time SESSIONS via Spark's native session_window (dynamic
    gap-merge). Works on batch and streaming frames; streaming requires
    the watermark (session state is unbounded otherwise) and — in append
    mode — emits a session only once it is CLOSED (watermark passed its
    end), which is exactly the semantics a sessionization consumer
    wants. The batch form is oracle-checked (parity
    session_window_stats); this is its ingest-time twin."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
