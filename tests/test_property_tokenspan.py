"""Property-based checks for exact-substring token-span dedup: a pure-
Python reference implementation of the k-gram pipeline is compared
against the Spark plans for arbitrary small corpora — catching slicing /
off-by-one / coverage-union regressions the fixed-corpus oracle can't.

Reference semantics (mirror of operators/tokenspan.py):
  grams(doc)  = [tuple(tokens[p:p+k]) for p in 0..len-k]
  duplicated  = grams appearing in >= min_docs DISTINCT docs
  covered(d)  = |union of [p, p+k) over d's duplicated gram starts|
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arango_etl_spark.operators.tokenspan import (
    duplicate_span_stats,
    strip_duplicate_spans,
)

K = 3
# tiny vocabulary + short docs -> real cross-doc k-gram collisions
corpora = st.lists(
    st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _reference(docs: list[list[int]], k: int = K):
    gram_docs: dict[tuple, set] = defaultdict(set)
    for i, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            gram_docs[tuple(toks[p : p + k])].add(i)
    dup = {g for g, ids in gram_docs.items() if len(ids) >= 2}
    out = {}
    for i, toks in enumerate(docs):
        starts = [p for p in range(len(toks) - k + 1) if tuple(toks[p : p + k]) in dup]
        covered = set()
        for p in starts:
            covered.update(range(p, p + k))
        out[i] = (len(toks), len(starts), len(covered))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora)
def test_span_stats_match_python_reference(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, tokens array<int>"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["dup_positions"], r["covered_tokens"])
        for r in duplicate_span_stats(df, k=K).collect()
    }
    assert got == _reference(docs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora)
def test_strip_keeps_exactly_uncovered_tokens(spark, docs):
    ref = _reference(docs)
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, tokens array<int>"
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in strip_duplicate_spans(df, k=K).collect()
    }
    gram_docs = defaultdict(set)
    for i, toks in enumerate(docs):
        for p in range(len(toks) - K + 1):
            gram_docs[tuple(toks[p : p + K])].add(i)
    dup = {g for g, ids in gram_docs.items() if len(ids) >= 2}
    for i, toks in enumerate(docs):
        covered = set()
        for p in range(len(toks) - K + 1):
            if tuple(toks[p : p + K]) in dup:
                covered.update(range(p, p + K))
        expect = [t for j, t in enumerate(toks) if j not in covered]
        assert got[i] == expect, (i, toks)
        # invariant: kept + covered == original length
        assert len(got[i]) + ref[i][2] == ref[i][0]
