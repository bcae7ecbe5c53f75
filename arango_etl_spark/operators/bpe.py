"""BPE merge training and encoding over token sequences — Sennrich et
al. 2016 ("Neural Machine Translation of Rare Words with Subword Units",
ACL): iteratively merge the most frequent adjacent token pair into a new
token id, producing a ranked merge table; encoding applies the merges in
rank order with standard left-to-right non-overlapping semantics.

Beyond-reference surface for the tokens payload: the engine's target
table stores pre-tokenized sequences — this operator pair is how those
sequences get (re)tokenized to a new vocabulary inside the same engine
instead of a side pipeline.

Spark-first shape, per training round:
  1. PAIR COUNT — one partial-agg shuffle: adjacent pairs come from a
     ``transform`` over positions (no self-join), grouped on (a, b).
  2. WINNER — ``orderBy(count desc, a, b).limit(1)``:
     TakeOrderedAndProject, a 1-row driver collect (deterministic
     tie-break: highest count, then lowest pair — matches the reference
     implementation used by the tests).
  3. APPLY — map-only rewrite of every sequence via an ``aggregate``
     left fold that merges non-overlapping occurrences left-to-right
     ("aaa" + merge (a,a) -> [aa, a], exactly like standard BPE).

So R merges cost R (shuffle + map) passes over the TRAINING frame.
Train on a sample: that is standard practice (BPE vocabularies are fit
on a corpus subset), and it bounds the iterative cost — pass
``df.sample(...)`` or a ``deterministic_sample`` slice as the training
frame, then ``bpe_encode`` the full corpus with the learned table.

Scale notes (100 TB):
- Encoding is one map-only pass; the R merge folds nest as R chained
  expressions, so keep R modest (tests cover 16) or materialize
  checkpoints every ~32 merges; a pandas-UDF kernel (dict-lookup loop
  over Arrow batches) is the drop-in for production vocab sizes (30k+
  merges), with this expression form as its exactness oracle.
- New token ids are allocated ABOVE the observed max id (one agg), so
  merges never collide with base vocabulary.

No SQL oracle: the train loop is iterative argmax-then-rewrite, which
ANSI SQL cannot express without recursion over lists — correctness is
pinned instead by a pure-Python reference implementation under
hypothesis (tests/test_bpe.py), the documented weaker gate for
iterative algorithms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _adjacent_pairs(tokens: Column) -> Column:
    """array of (a, b) structs for each adjacent position; empty for
    sequences shorter than 2 (sequence(1, n-1) would count DOWN)."""
    n = F.size(tokens)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(tokens, i).alias("a"),
                F.element_at(tokens, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:int,b:int>>"))


def _merge_once(tokens: Column, a: int, b: int, new_id: int) -> Column:
    """Left-to-right non-overlapping replace of (a, b) with new_id:
    a left fold whose accumulator is the rewritten prefix. new_id is
    allocated outside the existing vocab, so a merged token can never
    itself be the left half of the same merge."""
    return F.aggregate(
        tokens,
        F.array().cast("array<int>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(int(a)))
            & (t == F.lit(int(b))),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(int(new_id)).cast("int")),
            ),
        ).otherwise(F.concat(acc, F.array(t.cast("int")))),
    )


def bpe_train(
    train_df: DataFrame,
    n_merges: int,
    tokens_col: str = "tokens",
    min_count: int = 2,
    next_id: int | None = None,
) -> list[tuple[int, int, int]]:
    """Learn a ranked merge table [(a, b, new_id), ...] from the training
    frame. Stops early when no pair reaches min_count.

    ``next_id``: first merge-token id. Default = max(observed token in
    the TRAINING frame) + 1 — which is only collision-safe when the
    training frame sees the corpus's maximum token id. The documented
    workflow trains on a sample and encodes the FULL corpus: if the
    sample misses the corpus max, a merge id would collide with a
    genuine base token and the encoders silently corrupt sequences
    (r5 ADVICE #2). When training on a sample, pass ``next_id`` = the
    base vocabulary size (or max over the full corpus) + 1 explicitly."""
    cur = train_df.select(F.col(tokens_col).alias("tokens"))
    if next_id is None:
        next_id = (cur.agg(F.max(F.array_max("tokens"))).first()[0] or 0) + 1
    else:
        next_id = int(next_id)
    merges: list[tuple[int, int, int]] = []
    for _ in range(int(n_merges)):
        top = (
            cur.select(F.explode(_adjacent_pairs(F.col("tokens"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b = int(top[0]["a"]), int(top[0]["b"])
        merges.append((a, b, next_id))
        cur = cur.select(_merge_once(F.col("tokens"), a, b, next_id).alias("tokens"))
        # cut the growing lineage: R chained folds re-plan combinatorially
        cur = cur.localCheckpoint(eager=False)
        next_id += 1
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, int, int]],
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> DataFrame:
    """Apply the ranked merge table map-only (one chained expression per
    merge, whole-stage-codegen). Exactness reference for
    :func:`bpe_encode_arrow` — prefer that one beyond ~32 merges."""
    out = out_col or tokens_col
    col = F.col(tokens_col)
    for a, b, new_id in merges:
        col = _merge_once(col, a, b, new_id)
    return df.withColumn(out, col)


def bpe_encode_arrow(
    df: DataFrame,
    merges: list[tuple[int, int, int]],
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> DataFrame:
    """Production-vocab encoder: one Arrow-batched mapInPandas pass that
    applies ALL merges per sequence with the standard priority-by-rank
    loop (each pass merges the highest-ranked pair present, exactly the
    HF/sentencepiece apply order) — O(len · merges-applied) per row in
    Python-local loops over small lists, no per-merge plan growth, so
    30k-merge vocabularies cost one map stage instead of 30k chained
    expressions. Pinned against :func:`bpe_encode` (the expression form)
    by tests/test_bpe.py on TRAINED tables: there, rank order is creation
    order, so a later merge can only re-enable pairs involving its own
    new id — which rank later — and the two apply orders agree. (An
    arbitrary hand-written table violating that invariant may encode
    differently between the two, as it would between subword-nmt and HF
    tokenizers.)"""
    from arango_etl_spark.operators.dedup import _spread

    # the per-sequence merge loop is the CPU: a single-file input would
    # otherwise run the whole corpus through ONE Python worker (the
    # shingles/_spread pattern; no-op once input files >= parallelism)
    df = _spread(df)
    out = out_col or tokens_col
    rank = {(a, b): (r, new_id) for r, (a, b, new_id) in enumerate(merges)}

    def encode(seq: list) -> list:
        toks = list(seq)
        while len(toks) >= 2:
            best = None
            for i in range(len(toks) - 1):
                m = rank.get((toks[i], toks[i + 1]))
                if m is not None and (best is None or m[0] < best[0]):
                    best = (m[0], m[1], toks[i], toks[i + 1])
            if best is None:
                break
            _, new_id, a, b = best
            merged: list = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(new_id)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            toks = merged
        return toks

    schema_out = df.schema if out in df.columns else None
    if schema_out is None:
        import pyspark.sql.types as T

        fields = list(df.schema.fields) + [
            T.StructField(out, T.ArrayType(T.IntegerType()))
        ]
        schema_out = T.StructType(fields)

    def apply_batches(batches):
        for pdf in batches:
            pdf[out] = pdf[tokens_col].map(encode)
            yield pdf

    return df.mapInPandas(apply_batches, schema=schema_out)
