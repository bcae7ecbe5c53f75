"""Source readers (JSON/CSV with corrupt-record skip) and event-time
windowed stream metrics with watermarks."""

from __future__ import annotations

from pyspark.sql import functions as F

from arango_etl_spark.operators.merge_into import apply_changes
from arango_etl_spark.oracle import assert_states_equal, reduce_events_pandas
from arango_etl_spark.plans.lakehouse import SnapshotTable
from arango_etl_spark.sources.cdc_generator import GeneratorConfig, generate_events
from arango_etl_spark.sources.readers import (
    read_events_csv,
    read_events_json,
    read_events_parquet,
)
from arango_etl_spark.streaming.runner import EVENT_SCHEMA
from arango_etl_spark.streaming.windows import windowed_ingest_metrics
from tests.test_merge import PAYLOAD_SCHEMA

CFG = GeneratorConfig(n_events=800, n_docs=80, n_batches=2, seed=23)


def test_json_reader_skips_corrupt_lines(spark, tmp_path):
    events = generate_events(spark, CFG)
    p = str(tmp_path / "ev_json")
    events.coalesce(1).write.json(p)
    # inject malformed lines (and drop Hadoop's .crc sidecars, which the
    # local FS verifies on read and would reject the tampered file)
    import glob
    import os

    f = glob.glob(f"{p}/part-*.json")[0]
    with open(f, "a") as fh:
        fh.write('{"op": "insert", "broken\n')
        fh.write("not json at all\n")
    for crc in glob.glob(f"{p}/.*.crc"):
        os.unlink(crc)
    res = read_events_json(spark, p)
    assert res.corrupt_count == 2
    assert res.events.count() == events.count()
    # dead-letter quarantine keeps the poison records replayable
    dlq = str(tmp_path / "dlq")
    assert res.quarantine(dlq) == 2
    parked = spark.read.parquet(dlq)
    raws = {r["_corrupt_record"] for r in parked.collect()}
    assert raws == {'{"op": "insert", "broken', "not json at all"}
    assert parked.columns[-2:] == ["_source_file", "_quarantined_at"]
    # parquet path has no corrupt channel → no-op quarantine
    from arango_etl_spark.sources.readers import read_events_parquet

    pq = str(tmp_path / "ev_pq")
    events.coalesce(1).write.parquet(pq)
    assert read_events_parquet(spark, pq).quarantine(dlq + "2") == 0
    # and the cleaned stream replays to the same state as the parquet path
    t = SnapshotTable.create(str(tmp_path / "t"), PAYLOAD_SCHEMA, n_buckets=8)
    apply_changes(spark, t, res.events)
    expected = reduce_events_pandas(events.toPandas())
    assert_states_equal(t.read(spark).toPandas(), expected)


def test_corrupt_count_exact_after_partial_action(spark, tmp_path):
    """A partial action (take/limit/isEmpty) before reading corrupt_count
    must NOT undercount — the metric runs its own full aggregate, immune
    to short-circuited scans (ADVICE r2 medium: the Observation-based
    design was silently poisoned by whichever action completed first)."""
    import glob
    import os

    events = generate_events(spark, CFG)
    p = str(tmp_path / "ev_json")
    events.coalesce(1).write.json(p)
    f = glob.glob(f"{p}/part-*.json")[0]
    with open(f, "a") as fh:
        fh.write("corrupt line one\n")
        fh.write("corrupt line two\n")
        fh.write("corrupt line three\n")
    for crc in glob.glob(f"{p}/.*.crc"):
        os.unlink(crc)
    res = read_events_json(spark, p)
    # partial actions first — these short-circuit the scan
    res.events.take(1)
    assert not res.events.limit(5).isEmpty()
    assert res.corrupt_count == 3
    # repeated reads are cached, still exact
    assert res.corrupt_count == 3


def test_csv_reader_roundtrip(spark, tmp_path):
    events = (
        generate_events(spark, CFG)
        .withColumn("tokens", F.to_json("tokens"))
        # CSV is positional: write in EVENT_SCHEMA field order
        .select(*[f.name for f in EVENT_SCHEMA.fields])
    )
    p = str(tmp_path / "ev_csv")
    events.coalesce(1).write.option("header", "true").csv(p)
    res = read_events_csv(spark, p)
    assert res.corrupt_count == 0
    got = res.events
    assert got.schema["tokens"].dataType.simpleString() == "array<int>"
    assert got.count() == events.count()
    n_nonnull = got.where(F.col("tokens").isNotNull()).count()
    assert n_nonnull == events.where(F.col("tokens") != "null").count()


def test_parquet_reader(spark, tmp_path):
    events = generate_events(spark, CFG)
    p = str(tmp_path / "ev_pq")
    events.write.parquet(p)
    res = read_events_parquet(spark, p)
    assert res.corrupt_count == 0 and res.events.count() == events.count()


def test_windowed_metrics_batch_vs_manual(spark):
    events = generate_events(spark, CFG)
    m = windowed_ingest_metrics(events, window="1 minute")
    rows = m.collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()
    ops = {r["op"] for r in rows}
    assert ops == {"insert", "update", "delete"}


def test_windowed_metrics_streaming_with_watermark(spark, tmp_path):
    events = generate_events(spark, CFG)
    p = str(tmp_path / "ev_stream")
    events.write.parquet(p)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(p)
    )
    q = (
        windowed_ingest_metrics(stream, window="1 minute", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT sum(n_events) s FROM win_metrics").collect()[0]["s"]
    assert out == events.count()
