"""Map-typed accumulator operators (SURVEY.md A4/A5).

The reference maintains per-edge histogram maps {bucket: count} updated one
event at a time inside AQL UPSERTs
(/root/reference/src/handler/arangodb.rs:309-318 — N events on a hot edge
= N sequential round-trips). Here histograms are built batch-at-once with
groupBy and merged additively with map_zip_with: ``map_concat`` alone is
NOT additive (it overwrites on key collision) — SURVEY.md A4's caveat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram_map(
    df: DataFrame, key_cols: list[str], bucket_col: str, out_col: str = "hist"
) -> DataFrame:
    """Per-key histogram as MapType(bucket → count): groupBy twice —
    (key, bucket) count, then map_from_entries(collect_list)."""
    per_bucket = df.groupBy(*key_cols, bucket_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return per_bucket.groupBy(*key_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(bucket_col), F.col("_cnt")))
        ).alias(out_col)
    )


def map_add(a: Column, b: Column) -> Column:
    """Additive merge of two count maps: union of keys, values summed.

    map_zip_with(m1, m2, (k, v1, v2) -> coalesce(v1,0)+coalesce(v2,0)) —
    the MERGE expression for accumulate-on-conflict upserts (reference AQL
    `MERGE(OLD.hist, {bucket: OLD.hist[bucket] ? +1 : 1})`,
    /root/reference/src/handler/arangodb.rs:316-318).
    """
    return F.map_zip_with(
        a,
        b,
        lambda _k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
    )


def merge_histogram_upsert(
    target: DataFrame, source: DataFrame, key_cols: list[str], hist_col: str
) -> DataFrame:
    """Accumulate-upsert of histogram maps: full-outer join on key, additive
    map merge (the K3 counter+histogram UPSERT as one set-oriented plan)."""
    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in key_cols:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")
    key_exprs = [
        F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in key_cols
    ]
    merged_hist = (
        F.when(
            F.col(f"t.{hist_col}").isNull(), F.col(f"s.{hist_col}")
        )
        .when(F.col(f"s.{hist_col}").isNull(), F.col(f"t.{hist_col}"))
        .otherwise(map_add(F.col(f"t.{hist_col}"), F.col(f"s.{hist_col}")))
    )
    return joined.select(*key_exprs, merged_hist.alias(hist_col))
