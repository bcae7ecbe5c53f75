"""Metadata tables + manifest count stats: file inventory, commit
history, per-bucket rollups, and SELECT count(*) answered without a
data scan."""

from __future__ import annotations

import os

import pytest

from arango_etl_spark.operators.merge_into import apply_changes, compact
from arango_etl_spark.plans.lakehouse import SnapshotTable
from arango_etl_spark.plans.metadata import meta_df
from tests.test_merge import PAYLOAD_SCHEMA, ev, mk_events


def mk_table(tmp_path, name):
    return SnapshotTable.create(
        str(tmp_path / name), PAYLOAD_SCHEMA, key_col="doc_id", n_buckets=8
    )


def _ingest(spark, t, n=120, strategy="mor"):
    apply_changes(
        spark, t,
        mk_events(
            spark,
            [ev("insert", f"d{i:03d}", 1, [1, 2, 3]) for i in range(n)],
        ),
        batch_id=0, fence_stream_id="m", strategy=strategy, compact_every=0,
    )


def test_analyze_counts_incremental_and_row_count(spark, tmp_path):
    """analyze_counts scans ONLY uncounted files; with complete counts a
    flat snapshot answers row_count with NO SparkSession at all —
    tombstones subtracted exactly."""
    t = mk_table(tmp_path, "cnt")
    _ingest(spark, t, n=120)
    m1 = t.analyze_counts(spark)
    n_files_1 = sum(len(fs) for fs in m1["files"].values())
    assert m1["counted_files"] == n_files_1
    assert t.counts_complete()

    # second batch: the re-run counts exactly the new files
    apply_changes(
        spark, t,
        mk_events(
            spark,
            [ev("update", f"d{i:03d}", 5, [9]) for i in range(40)]
            + [ev("delete", f"d{i:03d}", 6, None) for i in range(40, 60)],
        ),
        batch_id=1, fence_stream_id="m", strategy="mor", compact_every=0,
    )
    m2 = t.analyze_counts(spark)
    n_files_2 = sum(len(fs) for fs in m2["files"].values())
    assert m2["counted_files"] == n_files_2 - n_files_1
    # MoR snapshot: metadata count impossible → needs a session, and the
    # fallback still agrees with read()
    with pytest.raises(ValueError):
        t.row_count()
    assert t.row_count(spark) == 100  # 120 - 20 deleted

    # compaction makes it flat; counts retrofit once more and count(*)
    # is pure manifest arithmetic — no session argument
    compact(spark, t)
    assert not t.counts_complete()  # rewritten files are uncounted
    t.analyze_counts(spark)
    assert t.row_count() == 100
    # idempotent re-run: zero files scanned
    assert t.analyze_counts(spark)["counted_files"] == 0


def test_files_and_partitions_tables(spark, tmp_path):
    """files/partitions metadata tables: totals agree with the manifest
    and with counted stats; uncounted buckets report null rows (never a
    guess)."""
    t = mk_table(tmp_path, "meta")
    _ingest(spark, t, n=120)
    m = t.manifest()
    files = meta_df(spark, t, "files")
    got = files.collect()
    assert len(got) == sum(len(fs) for fs in m["files"].values())
    assert all(r["size_bytes"] > 0 for r in got)
    assert all(r["rows"] is None for r in got)  # uncounted yet
    parts = {r["bucket"]: r for r in meta_df(spark, t, "partitions").collect()}
    assert all(p["rows"] is None for p in parts.values())

    t.analyze_counts(spark)
    t.analyze(spark, ["_seq_no"])
    t.analyze_bloom(spark, ["source"])
    files2 = meta_df(spark, t, "files").collect()
    assert sum(r["rows"] for r in files2) == 120
    assert all(r["zone_stat_cols"] == ["_seq_no"] for r in files2)
    assert all(r["bloom_cols"] == ["source"] for r in files2)
    parts2 = meta_df(spark, t, "partitions").collect()
    assert sum(p["rows"] for p in parts2) == 120
    assert sum(p["n_files"] for p in parts2) == len(files2)


def test_snapshots_table_history(spark, tmp_path):
    """snapshots metadata table: one row per retained version with mode
    and summary; expiry drops rows exactly like the on-disk manifests."""
    t = mk_table(tmp_path, "snap")
    _ingest(spark, t, n=50)
    compact(spark, t)
    t.analyze_counts(spark)
    snaps = meta_df(spark, t, "snapshots").collect()
    assert [r["version"] for r in snaps] == list(range(t.current_version() + 1))
    assert snaps[-2]["mode"] == "compact"
    assert snaps[-1]["mode"] == "analyze"
    assert snaps[-2]["one_row_per_key"] is True
    assert "analyze_counts" in snaps[-1]["summary"]

    t.expire_snapshots(keep_last=2)
    kept = meta_df(spark, t, "snapshots").collect()
    assert len(kept) == 2
    assert kept[-1]["version"] == t.current_version()


def test_write_time_counts(spark, tmp_path):
    """count_files=True: every commit counts only its staged files, so a
    CoW table answers row_count() metadata-only after EVERY commit (no
    retrofit), and an incremental compaction with count_files covers the
    rewritten bucket so the counts channel never goes stale."""
    t = mk_table(tmp_path, "wtc")
    apply_changes(
        spark, t,
        mk_events(
            spark, [ev("insert", f"d{i:03d}", i, [1]) for i in range(60)]
        ),
        batch_id=0, fence_stream_id="m", strategy="cow", compact_every=0,
        count_files=True,
    )
    assert t.counts_complete()
    assert t.row_count() == 60  # metadata-only, no session

    apply_changes(
        spark, t,
        mk_events(
            spark,
            [ev("update", f"d{i:03d}", 100 + i, [9]) for i in range(20)]
            + [ev("delete", f"d{i:03d}", 200 + i, None) for i in range(50, 60)],
        ),
        batch_id=1, fence_stream_id="m", strategy="cow", compact_every=0,
        count_files=True,
    )
    assert t.counts_complete()
    assert t.row_count() == 50  # still zero retrofit scans

    # MoR deltas + incremental compaction keep the channel complete when
    # the compaction itself counts its rewritten files
    apply_changes(
        spark, t,
        mk_events(spark, [ev("update", "d000", 999, [5])]),
        batch_id=2, fence_stream_id="m", strategy="mor", compact_every=0,
        count_files=True,
    )
    assert t.counts_complete()
    from arango_etl_spark.operators.merge_into import compact_buckets

    m = compact_buckets(spark, t, min_delta_files=2, count_files=True)
    assert t.counts_complete(m)


def test_col_bounds_metadata_only(spark, tmp_path):
    """Manifest min/max (Iceberg bounds aggregate-pushdown): flat +
    proven-tombstone-free + fully-stats'd snapshot answers (min, max)
    with NO SparkSession; any tombstone forces the honest scan fallback
    (zone maps include tombstoned rows, so manifest bounds would lie)."""
    from arango_etl_spark.operators.merge_into import compact

    t = mk_table(tmp_path, "bounds")
    apply_changes(  # inserts only, distinct seqs — no tombstones anywhere
        spark, t,
        mk_events(
            spark,
            [ev("insert", f"d{i:03d}", i, [1]) for i in range(80)],
        ),
        batch_id=0, fence_stream_id="m", strategy="mor", compact_every=0,
    )
    compact(spark, t)
    t.analyze_counts(spark)
    t.analyze(spark, ["_seq_no", "_event_ts"])
    # metadata-only: zero jobs, no session argument
    assert t.col_bounds("_seq_no") == (0, 79)
    assert t.col_bounds("_event_ts") == t.col_bounds("_event_ts", spark)

    # a delete introduces a tombstone owning the _seq_no max: after
    # recompaction the snapshot is flat again but counts prove
    # tombstones>0 → the metadata path refuses (manifest bounds would
    # report the tombstone's 99); the scan fallback answers the live max
    apply_changes(
        spark, t,
        mk_events(spark, [ev("delete", "d079", 99, None)]),
        batch_id=1, fence_stream_id="m", strategy="mor", compact_every=0,
    )
    compact(spark, t)
    t.analyze_counts(spark)
    t.analyze(spark, ["_seq_no"])
    with pytest.raises(ValueError):
        t.col_bounds("_seq_no")
    assert t.col_bounds("_seq_no", spark) == (0, 78)


def test_counts_survive_incremental_compaction(spark, tmp_path):
    """file_counts follow the file lifecycle: untouched buckets keep
    their entries across an incremental compaction; rewritten buckets
    drop theirs (stats can never outlive or contradict the file list)."""
    from arango_etl_spark.operators.merge_into import compact_buckets
    from pyspark.sql import functions as F

    t = mk_table(tmp_path, "lc")
    _ingest(spark, t, n=160)
    m0 = t.manifest()
    kdf = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(160)], "doc_id string"
    )
    by_b = {
        r["doc_id"]: r["b"]
        for r in kdf.select(
            "doc_id", t.bucket_expr(F.col("doc_id"), m0).alias("b")
        ).collect()
    }
    hot_b = sorted(set(by_b.values()))[0]
    hot_keys = [k for k, b in by_b.items() if b == hot_b]
    apply_changes(
        spark, t,
        mk_events(spark, [ev("update", k, 9, [7]) for k in hot_keys]),
        batch_id=1, fence_stream_id="m", strategy="mor", compact_every=0,
    )
    t.analyze_counts(spark)
    pre = t.manifest()
    m = compact_buckets(spark, t, min_delta_files=2)
    assert m["compacted_buckets"] == [hot_b]
    cold_files = {
        rel for b, fs in pre["files"].items() if int(b) != hot_b for rel in fs
    }
    assert cold_files <= set(m.get("file_counts", {}))
    hot_new = set(m["files"][str(hot_b)])
    assert not hot_new & set(m.get("file_counts", {}))
    # retrofit covers just the rewritten bucket's files
    assert t.analyze_counts(spark)["counted_files"] == len(hot_new)
    assert t.row_count(spark) == 160
