"""Metadata tables: the engine's analogue of Iceberg's ``<table>.files``
/ ``.snapshots`` / ``.partitions`` inspection tables — DataFrames built
from MANIFEST state, never from data-file contents.

Why this is a first-class scale feature: at 100 TB "how many files does
bucket 7 hold", "how big is the table", "what did commit v12 change"
must be answerable without touching a data page. Everything here reads
version manifests (bounded driver metadata, the same class as a
manifest load) plus, for file sizes, one ``getsize`` stat per file —
O(files) filesystem metadata calls, zero opens. The real-Iceberg
adapter (plans/iceberg_sink.py) delegates to Iceberg's own metadata
tables, which store sizes in the manifest and need no stat calls.

Row/tombstone counts come from the ``file_counts`` manifest channel
(``SnapshotTable.analyze_counts`` retrofit or write-time maintenance)
and are null for uncounted files — inspection never silently scans.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arango_etl_spark.plans.lakehouse import SnapshotTable

_FILES_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("size_bytes", T.LongType()),
    T.StructField("rows", T.LongType()),        # null until counted
    T.StructField("tombstones", T.LongType()),  # null until counted
    T.StructField("zone_stat_cols", T.ArrayType(T.StringType())),
    T.StructField("bloom_cols", T.ArrayType(T.StringType())),
])

_SNAPSHOTS_SCHEMA = T.StructType([
    T.StructField("version", T.IntegerType()),
    T.StructField("parent", T.IntegerType()),
    T.StructField("committed_at", T.TimestampType()),
    T.StructField("mode", T.StringType()),
    T.StructField("n_buckets", T.IntegerType()),
    T.StructField("one_row_per_key", T.BooleanType()),
    T.StructField("n_files", T.IntegerType()),
    T.StructField("summary", T.StringType()),
])


def files_df(
    spark: SparkSession, table: SnapshotTable, manifest: dict | None = None
) -> DataFrame:
    """One row per live data file of the snapshot: bucket, relative
    path, size, (rows, tombstones) when counted, and which secondary
    indexes cover it."""
    m = manifest or table.manifest()
    counts = m.get("file_counts", {})
    stats = m.get("file_stats", {})
    blooms = m.get("file_blooms", {})
    rows = []
    for b, fs in sorted(m["files"].items(), key=lambda kv: int(kv[0])):
        for rel in fs:
            c = counts.get(rel)
            rows.append((
                int(b),
                rel,
                os.path.getsize(os.path.join(table.root, rel)),
                int(c[0]) if c else None,
                int(c[1]) if c else None,
                sorted(stats.get(rel, {})),
                sorted(blooms.get(rel, {})),
            ))
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def snapshots_df(spark: SparkSession, table: SnapshotTable) -> DataFrame:
    """One row per RETAINED snapshot, oldest first (expired versions are
    gone from disk and absent here, like Iceberg after
    expire_snapshots). ``committed_at`` is the manifest file's mtime —
    the mini-format's commit timestamp."""
    rows = []
    import datetime as dt

    for v in range(table.current_version() + 1):
        path = os.path.join(table.meta_dir, f"v{v}.json")
        if not os.path.exists(path):
            continue
        m = table.manifest(v)
        rows.append((
            m["version"],
            m.get("parent"),
            dt.datetime.utcfromtimestamp(os.path.getmtime(path)),
            m.get("mode", "create"),
            m["n_buckets"],
            bool(m.get("one_row_per_key", m["version"] == 0)),
            sum(len(fs) for fs in m["files"].values()),
            json.dumps(m.get("summary", {}), sort_keys=True),
        ))
    return spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)


def partitions_df(
    spark: SparkSession, table: SnapshotTable, manifest: dict | None = None
) -> DataFrame:
    """Per-bucket rollup of ``files_df`` (Iceberg's ``.partitions``):
    file count, bytes, and counted rows/tombstones (null-preserving —
    a bucket with any uncounted file reports null rows, never a lie)."""
    f = files_df(spark, table, manifest)
    any_null = F.max(F.col("rows").isNull().cast("int")) == 1
    return (
        f.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("size_bytes"),
            F.when(any_null, F.lit(None).cast("long"))
            .otherwise(F.sum("rows")).alias("rows"),
            F.when(any_null, F.lit(None).cast("long"))
            .otherwise(F.sum("tombstones")).alias("tombstones"),
        )
        .orderBy("bucket")
    )


def meta_df(
    spark: SparkSession, table: SnapshotTable, kind: str
) -> DataFrame:
    fn = {
        "files": files_df,
        "snapshots": snapshots_df,
        "partitions": partitions_df,
    }.get(kind)
    if fn is None:
        raise ValueError(f"unknown metadata table {kind!r}")
    return fn(spark, table)
