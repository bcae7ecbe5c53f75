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


def token_baseline(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(tok, c_t) reference histogram — train it once on the trusted
    corpus, broadcast it against every monitored slice/window."""
    return (
        df.select(F.explode(tokens_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_t"))
    )


def tv_vs_baseline(
    counts: DataFrame, baseline: DataFrame, group_cols: list[str]
) -> DataFrame:
    """TV distance of each group's token counts vs a reference histogram.

    ``counts``: (group_cols..., tok, c); ``baseline``: (tok, c_t).
    Tokens unseen by the baseline contribute with c_t = 0; baseline
    tokens absent from a group contribute in closed form — neither set
    of missing pairs is materialized. Output per group:
    (group_cols..., n_tokens, distinct_tokens, tv_ppm) with tv_ppm an
    EXACT integer (see module docstring for the int64 bound)."""
    total = baseline.agg(F.sum("c_t").alias("n_total"))
    per_group = counts.groupBy(*group_cols).agg(
        F.sum("c").alias("n_s"), F.count("*").alias("distinct_tokens")
    )
    present = (
        counts.join(F.broadcast(baseline), "tok", "left")
        .withColumn("c_t", F.coalesce("c_t", F.lit(0)))
        .join(F.broadcast(per_group), group_cols)
        .crossJoin(F.broadcast(total))
        .groupBy(*group_cols)
        .agg(
            F.sum(
                F.abs(F.col("c") * F.col("n_total") - F.col("c_t") * F.col("n_s"))
            ).alias("sum_abs_present"),
            F.sum("c_t").alias("sum_ct_present"),
        )
    )
    return (
        per_group.join(present, group_cols)
        .crossJoin(F.broadcast(total))
        .select(
            *group_cols,
            F.col("n_s").alias("n_tokens"),
            "distinct_tokens",
            F.expr(
                "(sum_abs_present + n_s * (n_total - sum_ct_present)) * 1000000"
                " div (2 * n_s * n_total)"
            ).alias("tv_ppm"),
        )
    )


def token_distribution_drift(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-distribution TV distance vs the whole corpus
    (self-baseline: the reference histogram is the corpus itself).

    Returns (group_col, n_tokens, distinct_tokens, tv_ppm) with
    tv_ppm = floor(1e6 * TV) computed in exact integer arithmetic.
    Groups whose rows carry only empty token arrays produce no output
    row (there is no distribution to compare).
    """
    # NOTE (r6): a round-robin _spread of single-file inputs was A/B'd
    # here and LOST (1.2 s -> 1.9 s at sf0.1): the pre-shuffle stage is
    # a bare explode (cheap), the real work runs after the (group, tok)
    # exchange anyway, so the extra shuffle is pure overhead.
    counts = (
        df.select(group_col, F.explode(tokens_col).alias("tok"))
        .groupBy(group_col, "tok")
        .agg(F.count("*").alias("c"))
    )
    baseline = counts.groupBy("tok").agg(F.sum("c").alias("c_t"))
    return tv_vs_baseline(counts, baseline, [group_col])


def windowed_token_counts(
    stream: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "source",
    ts_col: str = "ingest_ts",
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming half of drift monitoring: watermarked per-(window,
    group, token) counts — a single append-mode streaming aggregation
    with state bounded by the watermark horizon. Sink these, then run
    :func:`tv_vs_baseline` over the sink with group_cols
    ``["window_start", group_col]`` as the batch finishing step (the TV
    reduction is a second aggregation, which append-mode streaming
    cannot chain — the same split the rollup maintainer uses)."""
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    return (
        src.select(ts_col, group_col, F.explode(tokens_col).alias("tok"))
        .groupBy(F.window(ts_col, window), group_col, "tok")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("window.start").alias("window_start"), group_col, "tok", "c"
        )
    )
