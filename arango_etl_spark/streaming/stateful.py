"""Custom stateful streaming operator: per-key LWW winner tracking with
applyInPandasWithState.

The engine's primary exactly-once path is stateless-transform +
stateful-sink (foreachBatch MERGE — SURVEY.md §2.8). This module provides
the complementary shape for consumers that want a *stream* of current
winners (a changelog of the target table) instead of a table: Spark-managed
per-key state holds the best (seq_no, event_ts, batch_id, op) seen so far
and emits a row whenever a key's winner changes.

State lives in the streaming state store (checkpointed, partitioned by
key hash) — this is the `applyInPandasWithState` surface from the public
Structured Streaming API; batches arrive as Arrow-backed pandas frames
(no per-row Python at the JVM boundary).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("seq_no", T.LongType()),
        T.StructField("is_delete", T.BooleanType()),
    ]
)

# state: the current winner's LWW tuple + payload
STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq_no", T.LongType()),
        T.StructField("event_ts_ms", T.LongType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _lww_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Reduce this batch's events for one doc_id against stored state;
    emit one row iff the winner changed. Vectorized: pandas idxmax over
    the LWW tuple, no per-row loop."""
    doc_id = key[0]
    best = None  # (seq_no, ts_ms, batch_id, op, tokens, n_tok, source)
    if state.exists:
        best = tuple(state.get)
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts_ms = (pdf["event_ts"].astype("int64") // 1_000_000).astype("int64")
        order = pd.DataFrame(
            {
                "seq_no": pdf["seq_no"],
                "ts": ts_ms,
                "batch": pdf["batch_id"],
                "op": pdf["op"],
            }
        )
        idx = order.sort_values(
            ["seq_no", "ts", "batch", "op"], kind="mergesort"
        ).index[-1]
        row = pdf.loc[idx]
        cand = (
            int(row["seq_no"]), int(ts_ms.loc[idx]), int(row["batch_id"]),
            str(row["op"]),
            None if row["tokens"] is None else [int(x) for x in row["tokens"]],
            None if pd.isna(row["n_tok"]) else int(row["n_tok"]),
            row["source"],
        )
        if best is None or cand[:4] > best[:4]:
            best = cand
    changed = best is not None and (not state.exists or tuple(state.get) != best)
    if best is not None:
        state.update(best)
    if changed:
        yield pd.DataFrame(
            {
                "doc_id": [doc_id],
                "tokens": [best[4]],
                "n_tok": [best[5]],
                "source": [best[6]],
                "seq_no": [best[0]],
                "is_delete": [best[3] == "delete"],
            }
        )


def lww_changelog(events_stream: DataFrame) -> DataFrame:
    """events stream → changelog of per-key winner updates."""
    return events_stream.groupBy("doc_id").applyInPandasWithState(
        _lww_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
