"""End-to-end training-data curation pipeline — the composition the
individual operators exist FOR: quality gate → near-duplicate cluster
representative → benchmark decontamination → deterministic mixture
sample. One call takes a raw document corpus to a curated, replayable
training set; every stage is the already-oracle-verified operator, and
the composition itself has a single composed DuckDB oracle
(parity.curated_training_set), so the driver gate checks the PIPELINE,
not just its parts.

Scale shape (100 TB): stages 1/3/4 are filters over broadcast- or
map-side state (quality is columnar; the eval-set shingles broadcast;
the mixture gate is arithmetic); only stage 2 (clustering) shuffles —
and it reuses near_dup_clusters' bounded LSH machinery. The final
training order is the shuffle_key sort, not a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arango_etl_spark.operators.dedup import (
    contamination_flags,
    near_dup_clusters,
)
from arango_etl_spark.operators.packing import mixture_sample


def curate_training_set(
    docs: DataFrame,
    benchmark: DataFrame,
    weights: dict[str, int],
    min_len: int = 100,
    min_alpha_ratio: float = 0.81,
    min_overlap: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Curated training set: (doc_id, source, shuffle_key) of the docs that

    1. pass the QUALITY gate — length ≥ min_len and alphabetic ratio
       ≥ min_alpha_ratio (compared on the RAW double, never rounded —
       both engines compute the identical int/int division);
    2. are their near-dup CLUSTER's representative (cluster_id == own id:
       exactly one survivor per duplicate cluster, deterministically the
       minimum id — dedup decisions, not just pair detection);
    3. share fewer than ``min_overlap`` word 3-grams with the
       ``benchmark`` eval set (DECONTAMINATION — the threshold separates
       vocabulary noise from real leakage; eval docs themselves far
       exceed it and are removed);
    4. survive the per-source MIXTURE gate at ``weights`` permille
       (replayable hash sampling; shuffle_key gives the training order).

    Filters 1/3/4 evaluate over the FULL corpus before intersection, and
    clustering runs on the full corpus too — a representative must be
    chosen per cluster before any row is dropped, or two near-dups could
    both survive through different filter paths.
    """
    lt = F.length(F.col(text_col))
    alpha = (
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
        .cast("double") / lt
    )
    quality_ids = docs.where(
        (lt >= min_len) & (alpha >= min_alpha_ratio)
    ).select(id_col)

    reps = near_dup_clusters(docs, text_col=text_col, id_col=id_col).where(
        F.col("cluster_id") == F.col(id_col)
    ).select(id_col)

    clean_ids = contamination_flags(
        docs, benchmark, text_col=text_col, id_col=id_col,
        ngram=3, min_overlap=min_overlap,
    ).where(~F.col("contaminated")).select(id_col)

    kept = (
        docs.select(id_col, source_col)
        .join(quality_ids, id_col)
        .join(reps, id_col)
        .join(clean_ids, id_col)
    )
    return mixture_sample(
        kept, weights, source_col=source_col, key_col=id_col
    )
