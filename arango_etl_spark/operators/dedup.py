"""Deduplication operators for training-data pipelines.

Exact dedup is a hash groupBy (see parity.exact_dedup_docs). This module
adds the near-duplicate family — all pure DataFrame plans over built-in
functions (xxhash64, explode, groupBy): no Python UDFs in any hot path.

Scale notes (100 TB):
- MinHash+LSH: cost is O(docs × n_hashes) map-side + one shuffle on
  (band, band_hash). Candidate verification joins doc pairs only within
  buckets — never the full cross product.
- SimHash: one pass, map-only until the final (optional) bucket join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread(docs: DataFrame) -> DataFrame:
    """Small dimension tables often arrive as one parquet file → one task.
    Spread to cluster parallelism before the CPU-heavy shingle/hash work
    (cost: one tiny shuffle; win: full-width codegen stages)."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def shingles(
    docs: DataFrame, text_col: str = "text", n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Word n-gram shingles per document (lowercased, whitespace-split)."""
    docs = _spread(docs)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    # n-gram i → concat of words[i..i+n)  (array slice + array_join)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    ).where(F.col("shingle") != "")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    ngram: int = 3,
) -> DataFrame:
    """MinHash signature per doc: sig[k] = min over shingles of
    xxhash64(shingle, seed=k). Vectorized via explode + groupBy(min)."""
    sh = shingles(docs, text_col, ngram, id_col)
    hashed = sh.select(
        id_col,
        *[
            F.xxhash64(F.col("shingle"), F.lit(k)).alias(f"h{k}")
            for k in range(n_hashes)
        ],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"h{k}").alias(f"h{k}") for k in range(n_hashes)]
    )
    return sig.select(
        id_col, F.array(*[f"h{k}" for k in range(n_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    n_bands: int = 8,
    ngram: int = 3,
) -> DataFrame:
    """LSH candidate pairs: band the signature, hash each band, self-join
    docs sharing any (band, band_hash) bucket. Returns (doc_a, doc_b,
    n_shared_bands) with doc_a < doc_b."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(docs, text_col, id_col, n_hashes, ngram)
    bands = sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(
                            F.col("signature"), b * rows_per_band + 1, rows_per_band
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.band_hash")
    # Pairs via bucket grouping, NOT a self-join: a self-join recomputes
    # the whole signature pipeline for each side; grouping computes it once
    # and generates in-bucket pairs with an array comprehension. Bucket
    # sizes are bounded (docs agreeing on a full band are near-dups).
    return _pairs_from_buckets(bands, ["band", "band_hash"], id_col).groupBy(
        "doc_a", "doc_b"
    ).agg(F.count(F.lit(1)).alias("n_shared_bands"))


def _pairs_from_buckets(
    df: DataFrame, bucket_cols: list[str], id_col: str, max_bucket: int = 1000
) -> DataFrame:
    """(doc_a, doc_b) for every unordered pair co-occurring in a bucket.

    Buckets larger than ``max_bucket`` are dropped (stop-shingle guard):
    a bucket of size m yields m(m-1)/2 pairs, so unbounded hot buckets —
    boilerplate text, empty docs — would explode quadratically at scale.
    """
    grouped = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("_ids"))
        .where(
            (F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket)
        )
    )
    pairs = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("_ids"), i + 2,
                    F.greatest(F.size("_ids") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return grouped.select(F.explode(pairs).alias("p")).select("p.doc_a", "p.doc_b")


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc: sum word-hash bit votes, sign → bit.

    Pure columnar: explode words → 64 bit-vote columns via shift/and →
    groupBy sum → reassemble bits. No UDF.
    """
    docs = _spread(docs)
    words = docs.select(
        id_col,
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("word"),
    )
    h = F.xxhash64("word")
    votes = words.select(
        id_col,
        *[
            (
                F.when(F.expr(f"(xxhash64(word) >> {i}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ],
    )
    _ = h
    summed = votes.groupBy(id_col).agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(64)]
    )
    # reassemble: sum of 2^i for positive-vote bits (use double → no int64
    # overflow issue for bit 63: keep bits 0..62 and sign separately)
    bit_terms = [
        F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
        for i in range(63)
    ]
    acc = bit_terms[0]
    for t in bit_terms[1:]:
        acc = acc + t
    return summed.select(
        F.col(id_col),
        acc.alias("simhash63"),
        (F.col("b63") > 0).alias("sign_bit"),
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane-LSH
    bucketing (same machinery as similarity search) proposes candidates;
    exact cosine confirms >= threshold. Never scans the cross product."""
    from arango_etl_spark.operators.similarity import (
        _dot,
        _norm,
        hyperplane_signs,
    )

    bits = hyperplane_signs(F.col(vec_col), dim, n_planes * n_tables)
    bucketed = embeddings.withColumn("_bits", bits).select(
        id_col,
        vec_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_tables - 1)),
                lambda t: F.xxhash64(
                    t, F.slice(F.col("_bits"), t * n_planes + 1, n_planes)
                ),
            )
        ).alias("_bucket"),
    )
    pairs = _pairs_from_buckets(bucketed, ["_bucket"], id_col).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    a = embeddings.select(
        F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_vb")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "cos_sim",
            F.round(
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb"))),
                6,
            ),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", "cos_sim")
    )


def jaccard_ngram_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs that share at
    least one shingle (inverted-index join — never a full cross product).

    |A∩B| from the shingle join; |A∪B| = |A|+|B|−|A∩B|.
    """
    sh = shingles(docs, text_col, ngram, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # inverted index: |A∩B| = number of shingle-buckets where both appear
    # (bucket grouping, not a self-join — see _pairs_from_buckets)
    inter = _pairs_from_buckets(sh, ["shingle"], id_col).groupBy(
        "doc_a", "doc_b"
    ).agg(F.count(F.lit(1)).alias("inter"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
