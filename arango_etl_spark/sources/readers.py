"""Change-event source readers: parquet (default), JSON lines, CSV —
schema-enforced, with the reference's decode-error policy (SURVEY.md
S4/F8: log-and-skip undecodable records, count them,
/root/reference/src/handler/arangodb_handler.rs:288-314).

Spark-native equivalent: PERMISSIVE mode parks bad records in
`_corrupt_record`; we split the stream into (good, corrupt_count) instead
of failing the batch — a poison *record* must not poison its file.

The corrupt count rides the SINGLE real pass via ``df.observe()`` (an
Observation on the pre-filter frame): when the caller materializes the
clean stream (the merge write), the count is collected for free. No
``.cache()`` of the input — at 100 TB caching the whole dataset to count
bad rows would thrash eviction before the pipeline starts (round-1
VERDICT #4). Reading ``corrupt_count`` BEFORE any action triggers one
counting pass as a convenience fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arango_etl_spark.streaming.runner import EVENT_SCHEMA


class ReadResult:
    """Clean event stream + lazily-observed corrupt-record count."""

    def __init__(self, events: DataFrame, observation: Observation | None = None):
        self.events = events
        self._obs = observation
        self._count: int | None = 0 if observation is None else None

    @property
    def corrupt_count(self) -> int:
        if self._count is None:
            try:
                # non-blocking probe (Spark 4.1 getOrEmpty throws on the
                # schemaless placeholder row while unpopulated)
                populated = not self._obs._jo.getOrEmpty().isEmpty()
            except Exception:
                populated = False
            if not populated:
                # no action has run yet — trigger the one pass ourselves
                self.events.count()
            self._count = int(self._obs.get["corrupt"])
        return self._count


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )


def _split(raw: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach the corrupt-count observation, return the clean stream."""
    obs = Observation()
    first_data_col = raw.columns[0]
    observed = raw.observe(
        obs,
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1)).alias("corrupt"),
        # also reference a real data column: Spark forbids JSON/CSV scans
        # whose only referenced column is the internal corrupt-record column
        # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which the pruned fallback
        # count() would otherwise be
        F.count(F.col(first_data_col)).alias("_seen_first_col"),
    )
    good = observed.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return good, obs


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
    good, obs = _split(raw)
    return ReadResult(events=good, observation=obs)


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
    good, obs = _split(raw)
    good = good.withColumn("tokens", F.from_json("tokens", "array<int>"))
    return ReadResult(events=good, observation=obs)


def read_events_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> ReadResult:
    """Parquet is self-describing — schema enforced, no corrupt-row mode."""
    df = (
        spark.read.schema(schema or EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return ReadResult(events=df)
