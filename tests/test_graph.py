"""Unit tests for operators/graph.py (k-hop BFS, bounded shortest paths,
triangle counting, fixed-iteration PageRank) and operators/text.bm25_topk
— hand-computed answers on tiny graphs/corpora, plus plan-shape guards
(no cartesian product in the triangle join; bm25 top-k is a global
TakeOrdered, never a single-partition window)."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from arango_etl_spark.operators.graph import (
    bounded_shortest_paths,
    k_hop,
    pagerank,
    symmetrize,
    triangle_count,
)
from arango_etl_spark.operators.text import bm25_topk


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node bigint")


# Path 1-2-3-4 plus a triangle {1,2,5}; node 6 isolated via 4-6.
_G = [(1, 2), (2, 3), (3, 4), (1, 5), (2, 5), (4, 6)]


def test_k_hop_min_depths(spark):
    und = symmetrize(_edges(spark, _G))
    out = {
        (r.seed, r.node): r.depth
        for r in k_hop(und, _seeds(spark, [1]), k=3).collect()
    }
    assert out == {
        (1, 1): 0,
        (1, 2): 1,
        (1, 5): 1,
        (1, 3): 2,
        (1, 4): 3,
    }  # node 6 is 4 hops out -> excluded


def test_k_hop_multi_seed_and_k0(spark):
    und = symmetrize(_edges(spark, _G))
    out = k_hop(und, _seeds(spark, [1, 6]), k=1).collect()
    got = {(r.seed, r.node): r.depth for r in out}
    assert got[(6, 4)] == 1 and got[(1, 2)] == 1
    only_self = k_hop(und, _seeds(spark, [3]), k=0).collect()
    assert [(r.seed, r.node, r.depth) for r in only_self] == [(3, 3, 0)]


def test_bounded_shortest_paths_weighted(spark):
    # 1->2 w1, 2->3 w1, 1->3 w5: two-hop path beats the direct edge.
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5)], "src bigint, dst bigint, w bigint"
    )
    out = {
        (r.seed, r.node): r.dist
        for r in bounded_shortest_paths(
            e, _seeds(spark, [1]), max_hops=3, weight_col="w"
        ).collect()
    }
    assert out == {(1, 1): 0, (1, 2): 1, (1, 3): 2}


def test_bounded_shortest_paths_hop_bound_is_honored(spark):
    # With max_hops=1 the 5-weight direct edge is the best reachable.
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5)], "src bigint, dst bigint, w bigint"
    )
    out = {
        (r.seed, r.node): r.dist
        for r in bounded_shortest_paths(
            e, _seeds(spark, [1]), max_hops=1, weight_col="w"
        ).collect()
    }
    assert out[(1, 3)] == 5


def test_triangle_count_global_and_per_node(spark):
    e = _edges(spark, _G)
    assert triangle_count(e).collect()[0].n_triangles == 1  # {1,2,5}
    per = {r.node: r.n_triangles for r in triangle_count(e, per_node=True).collect()}
    assert per == {1: 1, 2: 1, 5: 1}
    # Adding 3-5 creates a second triangle {2,3,5}.
    e2 = _edges(spark, _G + [(3, 5)])
    assert triangle_count(e2).collect()[0].n_triangles == 2


def test_triangle_orientations_agree(spark):
    # K4 plus a pendant and a hub fan: 4 triangles from K4, 0 elsewhere.
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    fan = [(9, i) for i in range(20, 30)] + [(4, 9)]
    e = _edges(spark, k4 + fan)
    for mode in ("degree", "id"):
        got = triangle_count(e, per_node=True, orientation=mode).collect()
        per = {r.node: r.n_triangles for r in got}
        assert per == {1: 3, 2: 3, 3: 3, 4: 3}, (mode, per)
    assert triangle_count(e, orientation="degree").collect()[0].n_triangles == 4


def test_triangle_plan_has_no_cartesian(spark):
    plan = triangle_count(_edges(spark, _G))._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_pagerank_sums_to_one_and_respects_symmetry(spark):
    # 4-cycle: all degrees equal -> uniform rank at every iteration.
    cyc = symmetrize(_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]))
    rows = pagerank(cyc, iters=3).collect()
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-9
    assert all(abs(r.rank - 0.25) < 1e-12 for r in rows)


def test_pagerank_dangling_mass_redistributed(spark):
    # Directed 1->2 with 2 dangling: mass must not leak (ranks sum to 1).
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    rows = {r.node: r.rank for r in pagerank(e, iters=2).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert rows[2] > rows[1]  # sink accumulates rank


def test_pagerank_star_center_dominates(spark):
    star = symmetrize(_edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)]))
    rows = {r.node: r.rank for r in pagerank(star, iters=3).collect()}
    assert rows[0] > max(rows[i] for i in (1, 2, 3, 4))
    leaf = [rows[i] for i in (1, 2, 3, 4)]
    assert max(leaf) - min(leaf) < 1e-12


def _bm25_expected(corpus, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus}
    n = float(len(corpus))
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: float(sum(1 for t in toks.values() if q in t)) for q in terms
    }
    out = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = float(t.count(q))
            if tf == 0 or df[q] == 0:
                continue
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(t) / avgdl)
            )
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_hand_formula(spark):
    corpus = [
        (1, "spark merge window merge"),
        (2, "window stream"),
        (3, "the quick fox"),
        (4, "merge"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r.doc_id: r.score
        for r in bm25_topk(docs, ["merge", "window"], k=10).collect()
    }
    assert got == pytest.approx(_bm25_expected(corpus, ["merge", "window"]))
    # doc 3 matches nothing -> absent from results
    assert 3 not in got


def test_bm25_topk_cut_and_plan(spark):
    corpus = [(i, "merge " * (i + 1)) for i in range(20)]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    q = bm25_topk(docs, ["merge"], k=5)
    rows = q.collect()
    assert len(rows) == 5
    # higher tf with same dl-normalization direction: top doc is the longest
    assert rows[0].score == max(r.score for r in rows)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_single_tokenization_pass(spark):
    """The df branch must REUSE the postings shuffle, not re-tokenize
    the corpus (static ReuseExchange; AQE applies the same reuse to its
    runtime stages)."""
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, "merge window stream") for i in range(10)],
        "doc_id bigint, text string",
    )
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            bm25_topk(docs, ["merge", "window"], k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("ReusedExchange") >= 1, plan[:3000]
