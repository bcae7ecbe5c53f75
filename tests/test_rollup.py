"""Incrementally-maintained rollup (continuous aggregate with
update/delete retraction via snapshot time travel) — after every batch
the rollup must equal a from-scratch groupBy of the base's state, and
replays / crash-recovery must be exactly-once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arango_etl_spark.operators.merge_into import apply_changes
from arango_etl_spark.streaming.rollup import (
    create_rollup_table,
    maintain_rollup,
    recompute_rollup,
)
from tests.test_merge import PAYLOAD_SCHEMA, ev, mk_events, mk_table


def _expected(spark, base):
    rows = (
        base.read(spark)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.coalesce(
                F.sum(F.col("n_tok").cast("double")), F.lit(0.0)
            ).alias("total"),
        )
        .collect()
    )
    return {r["source"]: (r["cnt"], r["total"]) for r in rows}


def _actual(spark, rollup):
    return {
        r["source"]: (r["cnt"], r["total"])
        for r in rollup.read(spark).collect()
    }


BATCHES = [
    # batch 0: inserts across two sources
    [ev("update", f"d{i}", i, [1] * (i + 1), batch=0,
        src=f"src_{i % 2}") for i in range(10)],
    # batch 1: updates move d0/d1 token counts, delete d2, new doc d10
    [
        ev("update", "d0", 100, [1] * 7, batch=1, src="src_0"),
        ev("update", "d1", 101, [1] * 9, batch=1, src="src_1"),
        ev("delete", "d2", 102, None, batch=1, src="src_0"),
        ev("update", "d10", 103, [1] * 3, batch=1, src="src_0"),
    ],
    # batch 2: delete the last src_1 heavy doc, update d10 twice
    # (in-batch dedup: only seq 201 wins)
    [
        ev("delete", "d9", 200, None, batch=2, src="src_1"),
        ev("update", "d10", 201, [1] * 5, batch=2, src="src_0"),
        ev("update", "d10", 199, [1] * 50, batch=2, src="src_0"),
    ],
]


def _mk(tmp_path):
    base = mk_table(tmp_path, "base")
    rollup = create_rollup_table(
        str(tmp_path / "rollup"), "source", T.StringType()
    )
    return base, rollup


def test_rollup_tracks_base_through_updates_and_deletes(spark, tmp_path):
    base, rollup = _mk(tmp_path)
    for b, rows in enumerate(BATCHES):
        out = maintain_rollup(
            spark, base, rollup, mk_events(spark, rows), batch_id=b,
            group_col="source", measure_col="n_tok",
        )
        assert out["rollup"] == "incremental"
        assert _actual(spark, rollup) == _expected(spark, base), f"batch {b}"


def test_rollup_replay_is_noop(spark, tmp_path):
    base, rollup = _mk(tmp_path)
    for b, rows in enumerate(BATCHES[:2]):
        maintain_rollup(
            spark, base, rollup, mk_events(spark, rows), batch_id=b,
            group_col="source", measure_col="n_tok",
        )
    v_base, v_roll = base.current_version(), rollup.current_version()
    out = maintain_rollup(
        spark, base, rollup, mk_events(spark, BATCHES[1]), batch_id=1,
        group_col="source", measure_col="n_tok",
    )
    assert out["rollup"] == "skipped"
    assert base.current_version() == v_base
    assert rollup.current_version() == v_roll


def test_rollup_heals_after_crash_between_commits(spark, tmp_path):
    """Crash simulation: the base commits a batch but the rollup does
    not (process died between the two). Re-running maintain_rollup must
    recover the pre-batch snapshot from the manifest chain and produce
    the exact rollup."""
    base, rollup = _mk(tmp_path)
    maintain_rollup(
        spark, base, rollup, mk_events(spark, BATCHES[0]), batch_id=0,
        group_col="source", measure_col="n_tok",
    )
    # "crash": batch 1 reaches the base only
    apply_changes(
        spark, base, mk_events(spark, BATCHES[1]), batch_id=1,
        fence_stream_id="rollup",
    )
    out = maintain_rollup(
        spark, base, rollup, mk_events(spark, BATCHES[1]), batch_id=1,
        group_col="source", measure_col="n_tok",
    )
    assert out["rollup"] == "incremental"
    assert _actual(spark, rollup) == _expected(spark, base)


def test_rollup_recomputes_when_history_expired(spark, tmp_path):
    """If expire_snapshots GC'd the pre-batch manifest before the rollup
    caught up, the maintainer falls back to a full recompute — correct,
    just not incremental."""
    base, rollup = _mk(tmp_path)
    maintain_rollup(
        spark, base, rollup, mk_events(spark, BATCHES[0]), batch_id=0,
        group_col="source", measure_col="n_tok",
    )
    apply_changes(
        spark, base, mk_events(spark, BATCHES[1]), batch_id=1,
        fence_stream_id="rollup",
    )
    base.expire_snapshots(keep_last=1)  # pre-batch manifest is gone
    out = maintain_rollup(
        spark, base, rollup, mk_events(spark, BATCHES[1]), batch_id=1,
        group_col="source", measure_col="n_tok",
    )
    assert out["rollup"] == "recomputed"
    assert _actual(spark, rollup) == _expected(spark, base)


def test_recompute_bootstrap(spark, tmp_path):
    """recompute_rollup initializes a rollup over a pre-existing base."""
    base, rollup = _mk(tmp_path)
    apply_changes(
        spark, base, mk_events(spark, BATCHES[0]), batch_id=0,
        fence_stream_id="rollup",
    )
    recompute_rollup(
        spark, base, rollup, "source", "n_tok", batch_id=0
    )
    assert _actual(spark, rollup) == _expected(spark, base)
    # and incremental maintenance continues from the bootstrap
    out = maintain_rollup(
        spark, base, rollup, mk_events(spark, BATCHES[1]), batch_id=1,
        group_col="source", measure_col="n_tok",
    )
    assert out["rollup"] == "incremental"
    assert _actual(spark, rollup) == _expected(spark, base)


def test_rollup_through_streaming_runner(spark, tmp_path):
    """run_ingest with rollup_root maintains the continuous aggregate
    epoch-by-epoch through the REAL streaming path, and a second drain
    of the same checkpoint changes nothing (fences on both tables)."""
    from arango_etl_spark.sources.cdc_generator import (
        GeneratorConfig,
        write_event_batches,
    )
    from arango_etl_spark.streaming.runner import IngestConfig, run_ingest

    feed = str(tmp_path / "feed")
    cfg_gen = GeneratorConfig(n_events=800, n_docs=60, n_batches=4, seed=5)
    write_event_batches(spark, cfg_gen, feed)
    base = mk_table(tmp_path, "sbase")
    rollup_root = str(tmp_path / "srollup")
    cfg = IngestConfig(
        stream_id="s", max_files_per_trigger=1, compact_every=0,
        rollup_root=rollup_root,
    )
    ckpt = str(tmp_path / "ckpt")
    run_ingest(spark, feed, base, ckpt, cfg=cfg)

    from arango_etl_spark.plans.lakehouse import SnapshotTable

    rollup = SnapshotTable(rollup_root)
    assert _actual(spark, rollup) == _expected(spark, base)
    v_b, v_r = base.current_version(), rollup.current_version()
    run_ingest(spark, feed, base, ckpt, cfg=cfg)  # re-drain: no-op
    assert base.current_version() == v_b
    assert rollup.current_version() == v_r
    assert _actual(spark, rollup) == _expected(spark, base)
