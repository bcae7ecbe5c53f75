"""Multi-sink fan-out ingest (operators/fanout.py): one batch → N tables,
per-sink fences, mid-fan-out crash healing — the reference's
four-collection populate loop (/root/reference/src/handler/arangodb.rs:345-376)
under the engine's exactly-once rules."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from arango_etl_spark.operators.fanout import (
    SinkSpec,
    apply_fan_out,
    event_archive_events,
    source_profile_events,
)
from arango_etl_spark.operators.merge_into import apply_changes
from arango_etl_spark.plans.lakehouse import SnapshotTable
from arango_etl_spark.streaming.runner import EVENT_SCHEMA

TS0 = dt.datetime(2024, 1, 1)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)
PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("last_doc_id", T.StringType()),
        T.StructField("last_n_tok", T.IntegerType()),
    ]
)
ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("event_key", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("event_op", T.StringType()),
    ]
)


def ev(op, doc, seq, toks, batch=0, src="src_0"):
    return (
        op, doc, seq, toks, None if toks is None else len(toks), src,
        batch, TS0 + dt.timedelta(seconds=seq),
    )


def mk_sinks(tmp_path, prefix=""):
    docs = SnapshotTable.create(
        str(tmp_path / f"{prefix}docs"), DOCS_SCHEMA, key_col="doc_id",
        n_buckets=4,
    )
    profiles = SnapshotTable.create(
        str(tmp_path / f"{prefix}profiles"), PROFILE_SCHEMA, key_col="source",
        n_buckets=4,
    )
    archive = SnapshotTable.create(
        str(tmp_path / f"{prefix}archive"), ARCHIVE_SCHEMA,
        key_col="event_key", n_buckets=4,
    )
    return {
        "docs": SinkSpec(docs, lambda df: df, compact_every=0),
        "profiles": SinkSpec(
            profiles, source_profile_events, compact_every=0
        ),
        "archive": SinkSpec(archive, event_archive_events, compact_every=0),
    }


BATCH0 = [
    ev("insert", "a", 1, [1, 1], src="web"),
    ev("insert", "b", 2, [2], src="books"),
    ev("update", "a", 3, [3, 3, 3], src="web"),
]
BATCH1 = [
    ev("delete", "b", 4, None, batch=1, src="books"),
    ev("update", "c", 5, [5, 5], batch=1, src="web"),
]


def test_fan_out_matches_single_sink_replays(spark, tmp_path):
    sinks = mk_sinks(tmp_path)
    for b, rows in enumerate([BATCH0, BATCH1]):
        apply_fan_out(
            spark, sinks, spark.createDataFrame(rows, EVENT_SCHEMA),
            batch_id=b, run_id="r1",
        )

    docs = {
        r["doc_id"]: r["n_tok"]
        for r in sinks["docs"].table.read(spark).collect()
    }
    assert docs == {"a": 3, "c": 2}  # b deleted

    profiles = {
        r["source"]: (r["last_doc_id"], r["last_n_tok"])
        for r in sinks["profiles"].table.read(spark).collect()
    }
    # the DELETE of b is still the latest observation of source 'books'
    assert profiles == {"web": ("c", 2), "books": ("b", None)}

    archive = sinks["archive"].table.read(spark)
    assert archive.count() == 5  # one immutable row per event
    assert (
        archive.where("event_op = 'delete'").collect()[0]["event_key"]
        == "b#4"
    )

    # equivalence: each sink state == an independent single-sink replay
    solo = SnapshotTable.create(
        str(tmp_path / "solo_profiles"), PROFILE_SCHEMA, key_col="source",
        n_buckets=4,
    )
    for b, rows in enumerate([BATCH0, BATCH1]):
        apply_changes(
            spark, solo,
            source_profile_events(spark.createDataFrame(rows, EVENT_SCHEMA)),
            batch_id=b, fence_stream_id="solo", compact_every=0,
        )
    solo_state = {
        r["source"]: (r["last_doc_id"], r["last_n_tok"])
        for r in solo.read(spark).collect()
    }
    assert solo_state == profiles


def test_fan_out_crash_between_sinks_heals_on_replay(spark, tmp_path):
    sinks = mk_sinks(tmp_path)
    batch = spark.createDataFrame(BATCH0, EVENT_SCHEMA)

    # crash AFTER 'archive' and 'docs' committed, BEFORE 'profiles'
    # (sorted order: archive, docs, profiles)
    with pytest.raises(RuntimeError, match="injected"):
        apply_fan_out(
            spark, sinks, batch, batch_id=0, run_id="r1",
            fail_sinks=frozenset({"profiles"}),
        )
    v_docs = sinks["docs"].table.current_version()
    assert v_docs > 0  # docs committed
    assert sinks["profiles"].table.current_version() == 0  # profiles did not

    # foreachBatch replays the epoch with the same batch_id: committed
    # sinks skip on their fence, the missing sink applies
    results = apply_fan_out(spark, sinks, batch, batch_id=0, run_id="r1")
    assert results["docs"].skipped
    assert results["archive"].skipped
    assert not results["profiles"].skipped
    assert sinks["docs"].table.current_version() == v_docs  # untouched

    profiles = {
        r["source"]: r["last_doc_id"]
        for r in sinks["profiles"].table.read(spark).collect()
    }
    assert profiles == {"web": "a", "books": "b"}

    # full duplicate replay: every sink a no-op
    again = apply_fan_out(spark, sinks, batch, batch_id=0, run_id="r1")
    assert all(r.skipped for r in again.values())
