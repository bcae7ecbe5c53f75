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


def test_tv_drift_plan_broadcasts_dimensions(spark):
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3, 4])], "source string, tokens array<int>"
    )
    out = token_distribution_drift(df)
    plan = explain.physical_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert explain.uses_broadcast_join(out)
    assert explain.has_partial_aggregation(out)
