"""BPE trainer/encoder vs a pure-Python reference (the documented gate
for iterative algorithms — no SQL oracle can express the train loop).

Reference semantics (mirror of operators/bpe.py — drift IS the bug):
  winner   = max count, ties to lowest (a, b)
  apply    = left-to-right non-overlapping replace
  new ids  = max(token) + 1, +1 per merge
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arango_etl_spark.operators.bpe import bpe_encode, bpe_train


def _py_apply(toks: list[int], a: int, b: int, new_id: int) -> list[int]:
    out: list[int] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_train(docs: list[list[int]], n_merges: int, min_count: int = 2):
    cur = [list(d) for d in docs]
    next_id = max((max(d) for d in cur if d), default=0) + 1
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[int, int], int] = {}
        for d in cur:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] = counts.get((d[i], d[i + 1]), 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _ = best
        merges.append((a, b, next_id))
        cur = [_py_apply(d, a, b, next_id) for d in cur]
        next_id += 1
    return merges


def test_bpe_classic_example(spark):
    # "aaabdaaabac"-style: pair (1,1) dominates, then the new token pairs.
    docs = [[1, 1, 1, 2, 4, 1, 1, 1, 2, 1, 3]]
    df = spark.createDataFrame([(0, docs[0])], "doc_id long, tokens array<int>")
    merges = bpe_train(df, n_merges=3)
    assert merges == _py_train(docs, 3)
    got = bpe_encode(df, merges).first()["tokens"]
    expect = docs[0]
    for a, b, nid in merges:
        expect = _py_apply(expect, a, b, nid)
    assert list(got) == expect


def test_bpe_overlap_is_left_to_right(spark):
    # "aaa" with merge (a,a): left-to-right gives [aa, a], never [a, aa]
    df = spark.createDataFrame(
        [(0, [1, 1, 1]), (1, [1, 1, 1, 1])], "doc_id long, tokens array<int>"
    )
    merges = bpe_train(df, n_merges=1)
    assert merges == [(1, 1, 2)]
    got = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(df, merges).collect()}
    assert got == {0: [2, 1], 1: [2, 2]}


def test_bpe_stops_below_min_count(spark):
    df = spark.createDataFrame(
        [(0, [1, 2]), (1, [3, 4])], "doc_id long, tokens array<int>"
    )
    assert bpe_train(df, n_merges=5, min_count=2) == []


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=10),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, tokens array<int>"
    )
    merges = bpe_train(df, n_merges=4)
    assert merges == _py_train(docs, 4)
    got = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(df, merges).collect()}
    expect = {}
    for i, d in enumerate(docs):
        cur = list(d)
        for a, b, nid in merges:
            cur = _py_apply(cur, a, b, nid)
        expect[i] = cur
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_arrow_encoder_matches_expression_encoder(spark, docs):
    """The production mapInPandas encoder and the expression encoder must
    agree on TRAINED merge tables (rank order == creation order)."""
    from arango_etl_spark.operators.bpe import bpe_encode_arrow

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, tokens array<int>"
    )
    merges = bpe_train(df, n_merges=5)
    expr = {r["doc_id"]: list(r["tokens"]) for r in bpe_encode(df, merges).collect()}
    arrow = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode_arrow(df, merges).collect()
    }
    assert arrow == expr


def test_bpe_encode_16_merges_is_one_projection(spark):
    # encoder must stay a single map-only plan even at 16 chained merges
    from arango_etl_spark.plans import explain

    df = spark.createDataFrame(
        [(i, [j % 5 for j in range(i % 12)]) for i in range(40)],
        "doc_id long, tokens array<int>",
    )
    merges = [(j % 5, (j + 1) % 5, 100 + j) for j in range(16)]
    out = bpe_encode(df, merges)
    plan = explain.physical_plan(out)
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    out.collect()  # and it executes
