from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from arango_etl_spark.operators.pq import build_pq_index, pq_topk
from arango_etl_spark.plans import explain

M, KSUB, DIM = 4, 4, 8  # dsub = 2


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _vec(i: int) -> list[int]:
    # 4 integer clusters along all dims + a small per-id wiggle
    base = (i % 4) * 30
    return [base + ((i + d) % 3) for d in range(DIM)]


def _fixture(spark, n=64):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)], "vec_id long, qvec array<int>"
    )


def _py_index(n=64):
    """Pure-Python mirror of build_pq_index's seed selection + encoding."""
    seeds = sorted(range(n), key=lambda i: (_h60(str(i)), i))[:KSUB]
    dsub = DIM // M
    cbs = [
        [_vec(s)[j * dsub : (j + 1) * dsub] for s in seeds] for j in range(M)
    ]
    def encode(v):
        out = []
        for j in range(M):
            sub = v[j * dsub : (j + 1) * dsub]
            d = [
                (sum((a - b) ** 2 for a, b in zip(sub, c)), ci)
                for ci, c in enumerate(cbs[j])
            ]
            out.append(min(d)[1])
        return out
    return cbs, encode


def test_pq_encoding_matches_python_reference(spark):
    idx = build_pq_index(_fixture(spark), m=M, ksub=KSUB)
    cbs, encode = _py_index()
    assert idx.codebooks == cbs
    got = {r["vec_id"]: list(r["codes"]) for r in idx.codes.collect()}
    assert got == {i: encode(_vec(i)) for i in range(64)}


def test_pq_adc_distance_is_exact_integer(spark):
    idx = build_pq_index(_fixture(spark), m=M, ksub=KSUB)
    cbs, encode = _py_index()
    q = [31, 30, 32, 30, 31, 30, 32, 30]
    qdf = spark.createDataFrame([(0, q)], "query_id long, qvec array<int>")
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_topk(idx, qdf, k=64).collect()
    }
    dsub = DIM // M
    for i in range(64):
        codes = encode(_vec(i))
        expect = sum(
            sum(
                (a - b) ** 2
                for a, b in zip(q[j * dsub : (j + 1) * dsub], cbs[j][codes[j]])
            )
            for j in range(M)
        )
        assert got[i] == expect, i


def test_pq_topk_recall_on_clustered_data(spark):
    # Query sits on cluster 2's centroid: every cluster-2 member must
    # out-rank every other cluster (inter-cluster gap 30 >> wiggle 2).
    idx = build_pq_index(_fixture(spark), m=M, ksub=KSUB)
    q = [60 + (d % 3) for d in range(DIM)]
    qdf = spark.createDataFrame([(0, q)], "query_id long, qvec array<int>")
    top16 = [r["vec_id"] for r in pq_topk(idx, qdf, k=16).collect()]
    assert sorted(top16) == [i for i in range(64) if i % 4 == 2]


def test_pq_topk_ties_break_to_lowest_id(spark):
    df = spark.createDataFrame(
        [(7, [1, 1]), (3, [1, 1]), (9, [50, 50])], "vec_id long, qvec array<int>"
    )
    idx = build_pq_index(df, m=1, ksub=2)
    qdf = spark.createDataFrame([(0, [1, 1])], "query_id long, qvec array<int>")
    rows = pq_topk(idx, qdf, k=2).collect()
    assert [r["vec_id"] for r in rows] == [3, 7]
    assert rows[0]["adc_dist"] == rows[1]["adc_dist"]


def test_pq_plans_are_jvm_side_and_partitioned(spark):
    idx = build_pq_index(_fixture(spark), m=M, ksub=KSUB)
    qdf = spark.createDataFrame(
        [(0, _vec(0)), (1, _vec(1))], "query_id long, qvec array<int>"
    )
    multi = pq_topk(idx, qdf, k=5)
    plan = explain.physical_plan(multi)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert explain.unpartitioned_window_count(multi) == 0
    single = pq_topk(
        idx, qdf.where(F.col("query_id") == 0), k=5, single_query=True
    )
    assert "TakeOrderedAndProject" in explain.physical_plan(single)
