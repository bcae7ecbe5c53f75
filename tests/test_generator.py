"""M0: generator determinism + oracle self-agreement (SURVEY.md §7.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arango_etl_spark.oracle import (
    assert_states_equal,
    reduce_events_duckdb,
    reduce_events_pandas,
)
from arango_etl_spark.sources.cdc_generator import (
    GeneratorConfig,
    generate_events,
    write_event_batches,
)

CFG = GeneratorConfig(n_events=5_000, n_docs=400, n_batches=4, seed=7)


def test_generator_deterministic(spark):
    a = generate_events(spark, CFG)
    b = generate_events(spark, CFG)
    ha = a.select(F.expr("bit_xor(xxhash64(*))").alias("h")).collect()[0]["h"]
    hb = b.select(F.expr("bit_xor(xxhash64(*))").alias("h")).collect()[0]["h"]
    assert ha == hb
    assert a.count() == b.count() > CFG.n_events  # dups added


def test_generator_shape(spark):
    ev = generate_events(spark, CFG)
    assert set(ev.columns) == {
        "op", "doc_id", "seq_no", "tokens", "n_tok", "source",
        "batch_id", "event_ts",
    }
    ops = {r["op"] for r in ev.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    # deletes carry null payloads; others n_tok == size(tokens)
    bad = ev.where(
        (F.col("op") != "delete") & (F.size("tokens") != F.col("n_tok"))
    ).count()
    assert bad == 0
    # duplicate deliveries exist: same (doc_id, seq_no) in >1 row
    dups = (
        ev.groupBy("doc_id", "seq_no").count().where(F.col("count") > 1).count()
    )
    assert dups > 0


def test_oracles_agree(spark, tmp_path):
    out = str(tmp_path / "events")
    write_event_batches(spark, CFG, out)
    via_duck = reduce_events_duckdb(f"{out}/batch=*/*.parquet")
    pdf = spark.read.parquet(out).toPandas()
    via_pandas = reduce_events_pandas(pdf)
    assert_states_equal(via_duck, via_pandas)
    assert len(via_duck) > 0
