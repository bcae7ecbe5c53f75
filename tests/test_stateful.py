"""Stateful streaming changelog (applyInPandasWithState): the stream of
per-key winner updates converges to the same final state as the oracle."""

from __future__ import annotations

import pytest

from arango_etl_spark.oracle import assert_states_equal, reduce_events_duckdb
from arango_etl_spark.sources.cdc_generator import (
    GeneratorConfig,
    write_event_batches,
)
from arango_etl_spark.streaming.runner import EVENT_SCHEMA
from arango_etl_spark.streaming.stateful import lww_changelog

CFG = GeneratorConfig(n_events=2_000, n_docs=150, n_batches=4, seed=13)


@pytest.mark.filterwarnings("ignore")
def test_changelog_converges_to_oracle(spark, tmp_path):
    d = str(tmp_path / "events")
    write_event_batches(spark, CFG, d)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        lww_changelog(stream)
        .writeStream.format("memory")
        .queryName("changelog")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emission per key (highest seq_no) = final state
    final = spark.sql(
        """
        SELECT doc_id, tokens, n_tok, source FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY seq_no DESC
            ) rn FROM changelog
        ) WHERE rn = 1 AND NOT is_delete
        """
    ).toPandas()
    expected = reduce_events_duckdb(f"{d}/batch=*/*.parquet")
    assert_states_equal(final, expected)
