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


def test_debezium_envelope_reader(spark, tmp_path):
    """Debezium envelopes (payload-wrapped AND unwrapped in one feed):
    op mapping, before/after image selection, lsn-over-ts_ms ordering,
    unknown-op + undecodable lines landing in the same DLQ channel."""
    import json
    import os

    from arango_etl_spark.sources.readers import read_events_debezium

    def env(op, after=None, before=None, lsn=None, ts_ms=0, wrap=True):
        body = {"op": op, "after": after, "before": before, "ts_ms": ts_ms,
                "source": {"name": "pg", "lsn": lsn, "txId": None}}
        return json.dumps({"payload": body} if wrap else body)

    row_a1 = {"doc_id": "a", "tokens": [1, 2], "n_tok": 2, "source": "s"}
    row_a2 = {"doc_id": "a", "tokens": [3], "n_tok": 1, "source": "s"}
    row_b = {"doc_id": "b", "tokens": [9], "n_tok": 1, "source": "s"}
    p = str(tmp_path / "dbz")
    os.makedirs(p)
    with open(f"{p}/feed.json", "w") as fh:
        fh.write(env("r", after=row_a1, lsn=10, ts_ms=1000) + "\n")        # snapshot read
        fh.write(env("u", after=row_a2, before=row_a1, lsn=20,
                     ts_ms=2000, wrap=False) + "\n")                       # unwrapped update
        fh.write(env("c", after=row_b, lsn=30, ts_ms=3000) + "\n")
        fh.write(env("d", before=row_b, lsn=40, ts_ms=4000) + "\n")        # delete keeps before
        fh.write(env("x", after=row_b, lsn=50, ts_ms=5000) + "\n")         # unknown op
        fh.write("garbage line\n")

    res = read_events_debezium(spark, p)
    rows = {(r["doc_id"], r["seq_no"]): r for r in res.events.collect()}
    assert len(rows) == 4
    assert rows[("a", 10)]["op"] == "insert"          # r → insert
    assert rows[("a", 20)]["op"] == "update"          # unwrapped parsed too
    assert rows[("a", 20)]["tokens"] == [3]           # after image, not before
    assert rows[("b", 40)]["op"] == "delete"
    assert rows[("b", 40)]["n_tok"] == 1              # before image on delete
    assert rows[("a", 10)]["event_ts"].timestamp() == 1.0

    # ts_ms fallback: a SEPARATE lsn-less feed (mixing scales in one
    # feed would interleave incomparable LWW orders — documented hazard)
    p2 = str(tmp_path / "dbz_nolsn")
    os.makedirs(p2)
    with open(f"{p2}/feed.json", "w") as fh:
        fh.write(env("c", after=row_b, lsn=None, ts_ms=3000) + "\n")
    r2 = read_events_debezium(spark, p2).events.collect()
    assert r2[0]["seq_no"] == 3000
    # unknown op + garbage → 2 in the DLQ channel
    assert res.corrupt_count == 2
    dlq = str(tmp_path / "dbz_dlq")
    assert res.quarantine(dlq) == 2

    # end-to-end: the parsed stream replays through the real merge engine
    t = SnapshotTable.create(
        str(tmp_path / "t_dbz"), PAYLOAD_SCHEMA, n_buckets=4
    )
    apply_changes(spark, t, res.events.withColumn("batch_id", F.lit(0)))
    final = {r["doc_id"]: r for r in t.read(spark).collect()}
    assert set(final) == {"a"}                        # b deleted at seq 40
    assert final["a"]["tokens"] == [3]                # LWW at seq 20


def test_debezium_projection_works_on_streams(spark, tmp_path):
    """debezium_to_events is pure-columnar: the same projection must
    plan on a readStream frame and drain the mapped rows."""
    import json
    import os

    from arango_etl_spark.sources.readers import (
        debezium_envelope_schema,
        debezium_to_events,
    )
    from tests.test_merge import PAYLOAD_SCHEMA as VS

    p = str(tmp_path / "dbz_stream")
    os.makedirs(p)
    body = {"op": "c", "after": {"doc_id": "z", "tokens": [7], "n_tok": 1,
                                 "source": "s"}, "before": None,
            "ts_ms": 1000, "source": {"name": "pg", "lsn": 5, "txId": None}}
    with open(f"{p}/feed.json", "w") as fh:
        fh.write(json.dumps({"payload": body}) + "\n")

    stream = (
        spark.readStream.schema(debezium_envelope_schema(VS))
        .json(p)
        .transform(lambda df: debezium_to_events(df, VS))
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("dbz_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM dbz_mem").collect()
    assert len(rows) == 1 and rows[0]["op"] == "insert"
    assert rows[0]["seq_no"] == 5 and rows[0]["doc_id"] == "z"


def test_replay_quarantine_drains_dlq(spark, tmp_path):
    """DLQ replay: after the producer fix (here: a widened schema), the
    recoverable records parse and rejoin the pipeline; garbage stays in
    the corrupt channel and can be re-parked — the DLQ drains
    monotonically."""
    import glob
    import os

    from pyspark.sql import types as T

    from arango_etl_spark.sources.readers import (
        read_events_json,
        replay_quarantine,
    )

    events = generate_events(spark, GeneratorConfig(
        n_events=50, n_docs=10, n_batches=1, seed=7))
    p = str(tmp_path / "ev_json")
    events.coalesce(1).write.json(p)
    f = glob.glob(f"{p}/part-*.json")[0]
    with open(f, "a") as fh:
        # recoverable: tokens sent as a STRING (type conflict vs array<int>)
        fh.write('{"op": "insert", "doc_id": "fix_me", "seq_no": 999, '
                 '"tokens": "1,2,3", "n_tok": 3, "source": "s", '
                 '"batch_id": 0, "event_ts": "2024-01-01T00:00:00Z"}\n')
        fh.write("unfixable garbage\n")
    for crc in glob.glob(f"{p}/.*.crc"):
        os.unlink(crc)
    res = read_events_json(spark, p)
    dlq = str(tmp_path / "dlq")
    assert res.quarantine(dlq) == 2

    widened = T.StructType([
        f if f.name != "tokens" else T.StructField("tokens", T.StringType())
        for f in EVENT_SCHEMA.fields
    ])
    replay = replay_quarantine(spark, dlq, schema=widened)
    got = replay.events.collect()
    assert len(got) == 1 and got[0]["doc_id"] == "fix_me"
    assert got[0]["tokens"] == "1,2,3"   # caller maps the widened column
    assert replay.corrupt_count == 1     # garbage is still bad
    dlq2 = str(tmp_path / "dlq2")
    assert replay.quarantine(dlq2) == 1  # re-parked: DLQ drains monotonically


def test_replay_quarantine_envelope_unknown_op_stays_bad(spark, tmp_path):
    """Envelope replay: a parseable-but-unknown-op record must stay in
    the bad channel (the live path DLQs it) — never silently vanish."""
    import json
    import os

    from arango_etl_spark.sources.readers import replay_quarantine

    dlq = str(tmp_path / "dlq_env")
    rows = [
        (json.dumps({"payload": {
            "op": "x", "after": {"doc_id": "a", "tokens": [1], "n_tok": 1,
                                 "source": "s"}, "before": None,
            "ts_ms": 1, "source": {"name": "pg", "lsn": 1, "txId": None}}}),),
        (json.dumps({"payload": {
            "op": "c", "after": {"doc_id": "b", "tokens": [2], "n_tok": 1,
                                 "source": "s"}, "before": None,
            "ts_ms": 2, "source": {"name": "pg", "lsn": 2, "txId": None}}}),),
    ]
    spark.createDataFrame(rows, "_corrupt_record string").write.parquet(dlq)
    replay = replay_quarantine(spark, dlq, envelope=True)
    got = replay.events.collect()
    assert len(got) == 1 and got[0]["doc_id"] == "b"
    assert replay.corrupt_count == 1     # the op="x" record


def test_shred_json_column_types_and_quarantine(spark):
    from arango_etl_spark.sources.readers import shred_json_column

    rows = [
        (1, '{"k": 7, "tag": "a"}'),        # clean
        (2, '{"k": 9}'),                    # missing field -> null tag, clean
        (3, 'not json at all'),             # malformed -> parked
        (4, '{}'),                          # parseable but empty -> parked
        (5, None),                          # null input -> null fields, NOT parked
    ]
    df = spark.createDataFrame(rows, "id bigint, props string")
    out = shred_json_column(df, "props", "k BIGINT, tag STRING")
    assert out.columns == ["id", "k", "tag", "_corrupt_json"]
    got = {r.id: r for r in out.collect()}
    assert got[1].k == 7 and got[1].tag == "a" and got[1]._corrupt_json is None
    assert got[2].k == 9 and got[2].tag is None and got[2]._corrupt_json is None
    assert got[3].k is None and got[3]._corrupt_json == "not json at all"
    assert got[4]._corrupt_json == "{}"
    assert got[5].k is None and got[5]._corrupt_json is None


def test_shred_json_column_nested_schema(spark):
    from arango_etl_spark.sources.readers import shred_json_column

    df = spark.createDataFrame(
        [(1, '{"id": 5, "tags": ["x", "y"], "meta": {"n": 3}}')],
        "row bigint, js string",
    )
    out = shred_json_column(
        df, "js", "id BIGINT, tags ARRAY<STRING>, meta STRUCT<n: BIGINT>"
    ).collect()[0]
    assert out.id == 5 and out.tags == ["x", "y"] and out.meta.n == 3
    assert out._corrupt_json is None
