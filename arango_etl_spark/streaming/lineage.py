"""Ingest lineage + metrics table (FIXTURES.md §3).

Replaces the reference's `files` ledger (done/retries,
/root/reference/src/document/iot_poc_file.rs:5-13) and its Redis XADD side
channel (/root/reference/src/handler/redis_handler.rs:19-24) with an
append-only parquet table of per-batch, per-input-partition counters —
queryable with plain SQL, and never silently dropping a batch (reference
hazard SURVEY.md §4.3.5).

Schema: batch_id, partition_id, events_seen, events_applied,
events_deduped, committed_at_seq, status, retries, wall_secs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("events_applied", T.LongType()),
        T.StructField("events_deduped", T.LongType()),
        T.StructField("committed_at_seq", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("retries", T.IntegerType()),
        T.StructField("wall_secs", T.DoubleType()),
    ]
)


class LineageLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def record_batch(
        self,
        events: DataFrame,
        batch_id: int,
        keys_applied: int | None,
        max_seq_no: int | None,
        status: str = "committed",
        retries: int = 0,
        wall_secs: float | None = None,
    ) -> None:
        """Per-input-partition counters for one micro-batch (north rule:
        per-partition lineage counters). One small agg job over the batch.

        Batch-level values (events_applied, events_deduped, wall) live on a
        SINGLE summary row (partition_id NULL) — repeating them per
        partition row made sums over the column overcount (round-1 ADVICE).
        The caller (runner) persists the batch, so this second action reads
        the cache, not the source files.
        """
        per_part = (
            events.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("events_seen"))
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.col("partition_id"),
                F.col("events_seen").cast("long"),
                F.lit(None).cast("long").alias("events_applied"),
                F.lit(None).cast("long").alias("events_deduped"),
                F.lit(None).cast("long").alias("committed_at_seq"),
                F.lit(status).alias("status"),
                F.lit(None).cast("int").alias("retries"),
                F.lit(None).cast("double").alias("wall_secs"),
            )
        )
        summary = (
            events.agg(F.count(F.lit(1)).alias("_n"))
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                F.lit(None).cast("int").alias("partition_id"),
                F.lit(None).cast("long").alias("events_seen"),
                F.lit(keys_applied).cast("long").alias("events_applied"),
                (
                    F.col("_n") - F.lit(keys_applied)
                ).cast("long").alias("events_deduped"),
                F.lit(max_seq_no).cast("long").alias("committed_at_seq"),
                F.lit(status).alias("status"),
                F.lit(retries).cast("int").alias("retries"),
                F.lit(wall_secs).cast("double").alias("wall_secs"),
            )
        )
        per_part.unionByName(summary).write.mode("append").parquet(
            os.path.join(self.root, f"batch={batch_id:012d}")
        )

    def record_failure(
        self, spark: SparkSession, batch_id: int, retries: int, status: str = "retried"
    ) -> None:
        """One row per failed attempt (partition_id = -1): the engine's
        retry ledger. The reference silently DROPPED a file when its retry
        lookup errored (/root/reference/src/handler/arangodb_handler.rs:132-136
        — hazard §4.3.5); here every attempt is durably recorded."""
        row = [(int(batch_id), -1, 0, 0, 0, None, status, int(retries), None)]
        spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            os.path.join(self.root, f"batch={batch_id:012d}")
        )

    def failure_count(self, spark: SparkSession, batch_id: int) -> int:
        p = os.path.join(self.root, f"batch={batch_id:012d}")
        if not os.path.exists(p):
            return 0
        df = spark.read.schema(LINEAGE_SCHEMA).parquet(p)
        return df.where(F.col("status").isin("retried", "poisoned")).count()

    def read(self, spark: SparkSession) -> DataFrame:
        dirs = [d for d in os.listdir(self.root) if d.startswith("batch=")]
        if not dirs:
            return spark.createDataFrame([], LINEAGE_SCHEMA)
        return spark.read.schema(LINEAGE_SCHEMA).parquet(
            *[os.path.join(self.root, d) for d in dirs]
        )

    def throughput(self, spark: SparkSession) -> DataFrame:
        """events/sec per batch — the lag/throughput metric surface."""
        return (
            self.read(spark)
            .groupBy("batch_id")
            .agg(
                F.sum("events_seen").alias("events_seen"),
                # wall_secs lives only on the batch summary row
                F.max("wall_secs").alias("wall_secs"),
            )
            .withColumn(
                "events_per_sec",
                F.when(
                    F.col("wall_secs") > 0,
                    F.col("events_seen") / F.col("wall_secs"),
                ),
            )
        )
