"""Change-event source readers: parquet (default), JSON lines, CSV —
schema-enforced, with the reference's decode-error policy (SURVEY.md
S4/F8: log-and-skip undecodable records, count them,
/root/reference/src/handler/arangodb_handler.rs:288-314).

Spark-native equivalent: PERMISSIVE mode parks bad records in
`_corrupt_record`; we split the stream into (good, bad_count) instead of
failing the batch — a poison *record* must not poison its file.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arango_etl_spark.streaming.runner import EVENT_SCHEMA


@dataclass
class ReadResult:
    events: DataFrame
    corrupt_count: int


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )


def read_events_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> ReadResult:
    """JSON-lines change events; malformed lines are counted and skipped,
    never fatal (PERMISSIVE + corrupt-record split)."""
    schema = schema or EVENT_SCHEMA
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # one pass for the count (cheap: corrupt rows only), one clean stream;
    # cache avoids re-reading if the caller materializes both
    raw = raw.cache()
    corrupt = raw.where(F.col("_corrupt_record").isNotNull()).count()
    good = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return ReadResult(events=good, corrupt_count=corrupt)


def read_events_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> ReadResult:
    """CSV change events with a JSON-encoded tokens column (CSV has no
    native arrays); malformed rows counted and skipped."""
    schema = schema or EVENT_SCHEMA
    flat = T.StructType(
        [
            f if f.name != "tokens" else T.StructField("tokens", T.StringType())
            for f in schema.fields
        ]
    )
    raw = (
        spark.read.schema(_with_corrupt(flat))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", "true")
        .csv(path)
    )
    raw = raw.cache()
    corrupt = raw.where(F.col("_corrupt_record").isNotNull()).count()
    good = (
        raw.where(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
        .withColumn("tokens", F.from_json("tokens", "array<int>"))
    )
    return ReadResult(events=good, corrupt_count=corrupt)


def read_events_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> ReadResult:
    """Parquet is self-describing — schema enforced, no corrupt-row mode."""
    df = (
        spark.read.schema(schema or EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return ReadResult(events=df, corrupt_count=0)
