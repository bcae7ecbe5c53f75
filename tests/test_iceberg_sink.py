"""Real-Iceberg adapter: full contract test when iceberg-spark-runtime is
on the classpath; otherwise skipped (this image ships no Iceberg jar —
SURVEY.md §7.0)."""

from __future__ import annotations

import pytest

from arango_etl_spark.plans import iceberg_sink


def test_iceberg_adapter_contract(spark, tmp_path):
    if not iceberg_sink.is_available(spark):
        pytest.skip("iceberg-spark-runtime not on classpath (expected here)")
    from pyspark.sql import functions as F

    from arango_etl_spark.operators.dedup_window import dedup_events
    from tests.test_merge import ev, mk_events

    ident = "iceberg.db.tok_seq_test"
    iceberg_sink.create_table(spark, ident, n_buckets=8)
    b0 = dedup_events(
        mk_events(spark, [ev("insert", "a", 1, [1]), ev("update", "a", 3, [3, 3])])
    )
    assert iceberg_sink.merge_batch(spark, ident, b0, 0, "cdc")
    assert not iceberg_sink.merge_batch(spark, ident, b0, 0, "cdc")  # fenced
    rows = iceberg_sink.read_public(spark, ident).collect()
    assert [list(r["tokens"]) for r in rows] == [[3, 3]]
    # late lower-seq event loses
    b1 = dedup_events(mk_events(spark, [ev("update", "a", 2, [2])]))
    iceberg_sink.merge_batch(spark, ident, b1, 1, "cdc")
    rows = iceberg_sink.read_public(spark, ident).collect()
    assert [list(r["tokens"]) for r in rows] == [[3, 3]]
    _ = F


def test_is_available_false_without_jar(spark):
    # in this image the jar is absent: the adapter must gate cleanly
    assert iceberg_sink.is_available(spark) in (False,)
