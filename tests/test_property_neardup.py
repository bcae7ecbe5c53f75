"""Property-based checks for the near-duplicate family (round-2 VERDICT
next-7): an independent pure-Python reference implementation of the
portable md5-affine hash pipeline is compared against the Spark plans for
arbitrary small corpora — catching hash-family regressions the
fixed-corpus oracle gate can't (it only sees one text distribution).

Reference formulas (mirrors of operators/dedup.py — any drift between the
two IS the bug being hunted):
  h60(s)   = int(md5(s).hexdigest()[:15], 16)
  sig[k]   = min over shingles of ((2k+3)·(h60 mod P) + k·1000003+12289) mod P
  shingles = word n-grams, i ∈ [0, max(len-n, 0)], lowercased, \\s+ split
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arango_etl_spark.operators.dedup import (
    HASH_P,
    jaccard_ngram_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
)

N_HASHES = 16
NGRAM = 2

# small vocabulary → real shingle collisions between docs
WORDS = ["alpha", "Beta", "gamma", "DELTA", "eps", "zeta7", "eta", "theta"]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles(text: str, n: int = NGRAM) -> set[str]:
    words = [w for w in text.lower().split() if w]
    if not words:
        return set()
    grams = {
        " ".join(words[i : i + n])
        for i in range(0, max(len(words) - n, 0) + 1)
    }
    return {g for g in grams if g}


def _sig(text: str, n_hashes: int = N_HASHES) -> list[int] | None:
    sh = _shingles(text)
    if not sh:
        return None  # no shingles → no signature row (groupBy drops it)
    hs = [_h60(s) % HASH_P for s in sh]
    return [
        min(((2 * k + 3) * h + k * 1000003 + 12289) % HASH_P for h in hs)
        for k in range(n_hashes)
    ]


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=2, max_value=8))
    texts = [
        " ".join(
            draw(
                st.lists(st.sampled_from(WORDS), min_size=0, max_size=6)
            )
        )
        for _ in range(n_docs)
    ]
    return texts


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpora())
def test_minhash_signatures_match_python_reference(spark, texts):
    got = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(
            _df(spark, texts), n_hashes=N_HASHES, ngram=NGRAM
        ).collect()
    }
    want = {i: _sig(t) for i, t in enumerate(texts) if _sig(t) is not None}
    assert got == want
    # corollary: identical texts → identical signatures (dedup soundness)
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if a == b and i in got and j in got:
                assert got[i] == got[j]


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpora())
def test_jaccard_pairs_match_python_reference(spark, texts):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_ngram_pairs(
            _df(spark, texts), ngram=NGRAM, threshold=0.0
        ).collect()
    }
    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    want = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] & sets[j]:
                want[(i, j)] = round(
                    len(sets[i] & sets[j]) / len(sets[i] | sets[j]), 6
                )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpora(), data=st.data())
def test_lsh_recall_floor_on_clones(spark, texts, data):
    """Exact clones MUST surface as LSH candidates agreeing on EVERY band
    (recall floor 1.0 for identical docs — the minimum any LSH scheme
    must honor), provided the doc has at least one shingle."""
    src = data.draw(st.integers(0, len(texts) - 1))
    if not _shingles(texts[src]):
        texts = texts + ["alpha beta gamma"]
        src = len(texts) - 1
    clone_id = len(texts)
    rows = [(i, t) for i, t in enumerate(texts)] + [(clone_id, texts[src])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_bands = 4
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in minhash_lsh_pairs(
            df, n_hashes=N_HASHES, n_bands=n_bands, ngram=NGRAM
        ).collect()
    }
    assert pairs.get((src, clone_id)) == n_bands


def test_jaccard_monotone_under_shared_shingle_growth(spark):
    """Appending shared text to both docs never decreases their jaccard;
    appending unshared text to one never increases it (set-arithmetic
    sanity pinned through the full Spark plan)."""
    base_a, base_b = "alpha beta gamma delta", "alpha beta zeta7 eta"

    def j(a: str, b: str) -> float:
        rows = jaccard_ngram_pairs(
            _df(spark, [a, b]), ngram=NGRAM, threshold=0.0
        ).collect()
        return rows[0]["jaccard"] if rows else 0.0

    j0 = j(base_a, base_b)
    shared = " theta eps theta eps"
    assert j(base_a + shared, base_b + shared) >= j0
    assert j(base_a + " zeta7 zeta7 gamma eps", base_b) <= j0


@pytest.mark.slow
def test_lsh_recall_on_seeded_clone_cluster(spark):
    """Plant 10 exact clones among 200 distinct docs: every one of the 45
    clone pairs must be an all-bands candidate; no distinct-doc pair may
    reach all bands unless genuinely near-identical."""
    import random

    rng = random.Random(7)
    texts = [
        " ".join(rng.choices(WORDS, k=rng.randint(4, 12))) for _ in range(200)
    ]
    clone = "alpha beta gamma delta eps zeta7 eta theta"
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, clone) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared_bands"]
        for r in minhash_lsh_pairs(
            df, n_hashes=N_HASHES, n_bands=4, ngram=NGRAM
        ).collect()
    }
    for i in range(10):
        for k in range(i + 1, 10):
            assert pairs.get((1000 + i, 1000 + k)) == 4
