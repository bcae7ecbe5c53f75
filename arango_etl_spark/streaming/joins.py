"""Stream-stream event-time interval joins — watermark-bounded state.

The reference engine joins a stream only against STATIC state (its sink
lookups); joining two live streams needs buffering with a correctness
bound on how long to wait for the other side. Structured Streaming's
stream-stream join does exactly that when given (a) watermarks on both
sides and (b) an event-time range in the join condition — the state
store then provably purges rows older than the watermark minus the
range, so state is O(rate × window), not O(stream).

The canonical shape here is click attribution: every click joins the
impressions of the same key within the preceding attribution window.
The SAME function works on batch frames (``withWatermark`` is a no-op
outside streaming), so the batch twin IS the oracle for the streaming
run — used by the tests and usable for backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    key_col: str = "user_id",
    imp_ts: str = "imp_ts",
    click_ts: str = "click_ts",
    attribution_window: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join each click to every impression of the same key whose
    timestamp lies in ``(click_ts - attribution_window, click_ts]`` —
    half-open at the old edge, closed at the click (a click exactly at
    the impression instant attributes).

    Streaming: both inputs get event-time watermarks and the range
    condition rides IN the join, so Spark bounds the buffered state and
    can emit in append mode. Batch: identical semantics, no state.

    Columns in: impressions(key, imp_ts, imp_id, ...), clicks(key,
    click_ts, click_id, ...). Columns out: key, click_id, click_ts,
    imp_id, imp_ts, lag_seconds.
    """
    i = impressions.withWatermark(imp_ts, watermark).alias("i")
    c = clicks.withWatermark(click_ts, watermark).alias("c")
    cond = (
        (F.col(f"i.{key_col}") == F.col(f"c.{key_col}"))
        & (F.col(f"i.{imp_ts}") <= F.col(f"c.{click_ts}"))
        & (
            F.col(f"i.{imp_ts}")
            > F.col(f"c.{click_ts}") - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return c.join(i, cond, "inner").select(
        F.col(f"c.{key_col}").alias(key_col),
        F.col("c.click_id"),
        F.col(f"c.{click_ts}").alias(click_ts),
        F.col("i.imp_id"),
        F.col(f"i.{imp_ts}").alias(imp_ts),
        (
            F.unix_millis(F.col(f"c.{click_ts}"))
            - F.unix_millis(F.col(f"i.{imp_ts}"))
        ).cast("double").alias("lag_millis"),
    )
