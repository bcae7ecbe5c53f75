from __future__ import annotations

from arango_etl_spark.operators.drift import token_distribution_drift
from arango_etl_spark.plans import explain


def test_tv_drift_hand_computed(spark):
    # g1: {1:2, 2:1}/3   g2: {2:2, 3:1}/3   corpus: {1:2, 2:3, 3:1}/6
    # TV(g1) = (|2/3-1/3| + |1/3-1/2| + |0-1/6|)/2 = 1/3 -> 333333 ppm
    df = spark.createDataFrame(
        [("g1", [1, 1, 2]), ("g2", [2, 2, 3])], "source string, tokens array<int>"
    )
    rows = {r["source"]: r for r in token_distribution_drift(df).collect()}
    assert rows["g1"]["n_tokens"] == 3 and rows["g1"]["distinct_tokens"] == 2
    assert rows["g1"]["tv_ppm"] == 333333
    assert rows["g2"]["tv_ppm"] == 333333


def test_tv_drift_identical_distributions_is_zero(spark):
    df = spark.createDataFrame(
        [("a", [5, 6, 7]), ("b", [5, 6, 7]), ("b", [5, 6, 7])],
        "source string, tokens array<int>",
    )
    rows = token_distribution_drift(df).collect()
    assert all(r["tv_ppm"] == 0 for r in rows)


def test_tv_drift_disjoint_vocab_is_full(spark):
    # Disjoint vocabularies, equal sizes: TV = 1 - n_s/n = 1/2 -> 500000.
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3, 4])], "source string, tokens array<int>"
    )
    rows = {r["source"]: r for r in token_distribution_drift(df).collect()}
    assert rows["a"]["tv_ppm"] == 500000 and rows["b"]["tv_ppm"] == 500000


def test_tv_vs_external_baseline_with_unknown_tokens(spark):
    from arango_etl_spark.operators.drift import token_baseline, tv_vs_baseline

    # baseline: {1:2, 2:2}/4. group g: {1:1, 9:1}/2 (9 unseen by baseline)
    # TV = (|1/2-1/2| + |0-1/2| + |1/2-0|)/2 = 1/2 -> 500000 ppm
    base = token_baseline(
        spark.createDataFrame([([1, 2],), ([1, 2],)], "tokens array<int>")
    )
    counts = spark.createDataFrame(
        [("g", 1, 1), ("g", 9, 1)], "source string, tok int, c long"
    )
    row = tv_vs_baseline(counts, base, ["source"]).first()
    assert row["n_tokens"] == 2 and row["distinct_tokens"] == 2
    assert row["tv_ppm"] == 500000


def test_windowed_token_counts_stream_then_tv_finish(spark, tmp_path):
    """Streaming drift twin: watermarked (window, source, token) counts
    land in the sink; tv_vs_baseline over the sink equals the batch
    computation over the same frame."""
    import datetime as dt

    from arango_etl_spark.operators.drift import (
        token_baseline,
        tv_vs_baseline,
        windowed_token_counts,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "doc_id long, source string, tokens array<int>, ingest_ts timestamp"
    rows0 = [(1, "a", [1, 1, 2], t0), (2, "b", [2, 3], t0)]
    rows1 = [(3, "a", [1, 4], t0 + dt.timedelta(hours=1))]
    # append mode only emits a window once the watermark passes its END:
    # a sentinel event 3h later flushes both real windows (its own
    # still-open window stays in state and is excluded from the compare)
    flush = [(99, "z", [7], t0 + dt.timedelta(hours=3))]
    feed = str(tmp_path / "feed")
    spark.createDataFrame(rows0, schema).coalesce(1).write.parquet(f"{feed}/f0")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(f"{feed}/f1")
    spark.createDataFrame(flush, schema).coalesce(1).write.parquet(f"{feed}/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
    )
    q = (
        windowed_token_counts(stream, window="1 hour", watermark="5 minutes")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sunk = spark.read.parquet(str(tmp_path / "sink"))
    batch_counts = windowed_token_counts(
        spark.createDataFrame(rows0 + rows1, schema)
    )
    assert sorted(map(tuple, sunk.collect())) == sorted(
        map(tuple, batch_counts.collect())
    )  # the sentinel's open window is in neither frame
    base = token_baseline(spark.createDataFrame(rows0 + rows1, schema))
    finish = tv_vs_baseline(sunk, base, ["window_start", "source"])
    twin = tv_vs_baseline(batch_counts, base, ["window_start", "source"])
    assert sorted(map(tuple, finish.collect())) == sorted(map(tuple, twin.collect()))
    assert finish.count() == 3  # (win0,a), (win0,b), (win1,a)


def test_tv_drift_plan_broadcasts_dimensions(spark):
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3, 4])], "source string, tokens array<int>"
    )
    out = token_distribution_drift(df)
    plan = explain.physical_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert explain.uses_broadcast_join(out)
    assert explain.has_partial_aggregation(out)
