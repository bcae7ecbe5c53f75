"""Distribution-drift metrics between data slices — the monitoring leg of
a training-data pipeline: is one source's token mix diverging from the
corpus (a scraper went bad, a source flipped language, a dedup pass
skewed the mixture)?

Beyond-reference surface (the reference carries no corpus analytics; its
aggregation surface stops at per-key counters,
/root/reference/src/handler/arangodb.rs counter upserts).

``token_distribution_drift`` computes, per group (e.g. per source), the
total-variation distance between the group's token distribution and the
whole-corpus distribution:

    TV(s) = 1/2 * sum_t | c_st/N_s - c_t/N |

reported as an EXACT integer ppm — the sum is computed over integer
cross-products (|c_st*N - c_t*N_s|), so Spark and any SQL oracle agree
bit-for-bit with no float-summation-order jitter. Tokens absent from a
group contribute in closed form (N_s * (N - sum of c_t over present
tokens)) instead of materializing the missing (group, token) pairs.

Plan shape / scale notes (100 TB):
- ONE wide shuffle: the (group, token) partial-agg count over the
  exploded corpus. Everything after operates on that counts frame:
  the per-token corpus histogram (<= |vocab| rows) and the per-group
  totals (<= |groups| rows) are re-aggregations of it, joined back via
  BROADCAST (both sides are small by construction).
- Integer-exactness bound: products are <= N * max(c) < N^2. For
  N beyond ~3e9 total tokens (N^2 ~ 2^63), pre-divide counts into
  double frequencies instead — drift is a monitoring metric, so the
  ~1e-15 relative float jitter is immaterial; ANSI mode makes the
  overflow loud, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_distribution_drift(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-distribution TV distance vs the whole corpus.

    Returns (group_col, n_tokens, distinct_tokens, tv_ppm) with
    tv_ppm = floor(1e6 * TV) computed in exact integer arithmetic.
    """
    tok = df.select(group_col, F.explode(tokens_col).alias("tok"))
    st = tok.groupBy(group_col, "tok").agg(F.count("*").alias("c_st"))

    per_token = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    per_group = st.groupBy(group_col).agg(
        F.sum("c_st").alias("n_s"), F.count("*").alias("distinct_tokens")
    )
    total = per_token.agg(F.sum("c_t").alias("n_total"))

    present = (
        st.join(F.broadcast(per_token), "tok")
        .join(F.broadcast(per_group), group_col)
        .crossJoin(F.broadcast(total))
        .groupBy(group_col)
        .agg(
            F.sum(F.abs(F.col("c_st") * F.col("n_total") - F.col("c_t") * F.col("n_s"))).alias(
                "sum_abs_present"
            ),
            F.sum("c_t").alias("sum_ct_present"),
        )
    )
    return (
        per_group.join(present, group_col)
        .crossJoin(F.broadcast(total))
        .select(
            group_col,
            F.col("n_s").alias("n_tokens"),
            "distinct_tokens",
            F.expr(
                "(sum_abs_present + n_s * (n_total - sum_ct_present)) * 1000000"
                " div (2 * n_s * n_total)"
            ).alias("tv_ppm"),
        )
    )
