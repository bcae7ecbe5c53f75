from __future__ import annotations

from pyspark.sql import functions as F

from arango_etl_spark.operators import tokenspan
from arango_etl_spark.plans import explain


def _fixture(spark):
    # B embeds A's tokens[5..12] (1-based, k=8 span); C is unique; D is
    # shorter than k and must survive with zero grams.
    a = list(range(1, 21))
    planted = a[4:12]  # values 5..12 -> positions 5..12 in A
    b = [101, 102, 103] + planted + [201, 202]
    c = [901 + i for i in range(15)]
    d = [7, 8, 9]
    return spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, tokens array<int>"
    )


def test_duplicate_span_stats_planted(spark):
    stats = {
        r["doc_id"]: r
        for r in tokenspan.duplicate_span_stats(_fixture(spark), k=8).collect()
    }
    assert len(stats) == 4  # every doc keeps a row
    assert stats[1]["dup_positions"] == 1 and stats[1]["covered_tokens"] == 8
    assert stats[2]["dup_positions"] == 1 and stats[2]["covered_tokens"] == 8
    assert stats[3]["dup_positions"] == 0 and stats[3]["covered_tokens"] == 0
    assert stats[4]["n_tok"] == 3 and stats[4]["dup_positions"] == 0
    # exact integer ppm: 8/20 and 8/13 of the doc covered
    assert stats[1]["coverage_ppm"] == 8 * 1_000_000 // 20
    assert stats[2]["coverage_ppm"] == 8 * 1_000_000 // 13
    assert stats[3]["coverage_ppm"] == 0


def test_overlapping_grams_cover_union_not_sum(spark):
    # Two docs share a 9-token run -> two overlapping 8-grams, union = 9.
    run = [11, 12, 13, 14, 15, 16, 17, 18, 19]
    df = spark.createDataFrame(
        [(1, run + [500]), (2, [600] + run)], "doc_id long, tokens array<int>"
    )
    stats = {r["doc_id"]: r for r in tokenspan.duplicate_span_stats(df, k=8).collect()}
    assert stats[1]["dup_positions"] == 2
    assert stats[1]["covered_tokens"] == 9  # not 16
    assert stats[2]["covered_tokens"] == 9


def test_rolling_mode_matches_exact(spark):
    # Synthetic sentence-pool corpus: real cross-doc duplicate spans.
    docs = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(3) + F.pmod(F.col("id"), F.lit(5))),
                lambda j: F.transform(
                    F.sequence(F.lit(1), F.lit(8)),
                    lambda i: F.pmod(
                        F.pmod(F.col("id") * 13 + j * 11, F.lit(797)) * 23 + i * 7,
                        F.lit(50000),
                    ).cast("int"),
                ),
            )
        ).alias("tokens"),
    )
    exact = tokenspan.duplicate_span_stats(docs, k=8, mode="exact")
    rolling = tokenspan.duplicate_span_stats(docs, k=8, mode="rolling")
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, rolling.collect()))
    # and something is actually duplicated in this corpus
    assert exact.agg(F.sum("dup_positions")).first()[0] > 0


def test_strip_duplicate_spans(spark):
    out = {
        r["doc_id"]: r["tokens"]
        for r in tokenspan.strip_duplicate_spans(_fixture(spark), k=8).collect()
    }
    assert out[1] == [1, 2, 3, 4] + list(range(13, 21))  # positions 5..12 gone
    assert out[2] == [101, 102, 103, 201, 202]
    assert out[3] == [901 + i for i in range(15)]  # untouched
    assert out[4] == [7, 8, 9]  # shorter than k, untouched


def test_tokenspan_plan_is_jvm_side(spark):
    stats = tokenspan.duplicate_span_stats(_fixture(spark), k=8, mode="rolling")
    plan = explain.physical_plan(stats)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert explain.has_partial_aggregation(stats)
