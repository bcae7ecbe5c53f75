"""Time-series resampling: gap-filled buckets with last-observation-
carried-forward — the hypertable `time_bucket_gapfill(...) + locf()`
surface, Spark-first.

Why: the reference's ingest tables are time-keyed telemetry (beacons /
witness reports with received_timestamp, reference
src/document/beacon.rs / witness.rs); the standard downstream read is a
regular-grid series per entity (dashboards, feature windows for
training), which needs gap filling when a device goes quiet. This
operator turns an irregular event stream into that dense per-key grid.

Execution shape (design for 100 TB):

- bucketing is map-side epoch arithmetic (floor to the bucket width —
  never a UDF);
- per-(key, bucket) "last observation" is a per-key window (rank over
  (ts, tiebreak) DESC) — partitioned by key, never global;
- the dense spine is `sequence()`-generated per key from a 1-row
  broadcast global [min, max] bucket range — no driver loop, no
  cartesian against a driver-built calendar table. Fan-out =
  n_keys × n_buckets rows, guarded by ``max_buckets`` fail-fast
  (the rangejoin guard pattern) so a mis-set width cannot silently
  explode the cluster;
- the fill itself is one per-key ordered window pass
  (``last(..., ignorenulls=True)`` over unbounded-preceding rows).

Oracle-portability: bucket epochs are FLOORED before casting (DuckDB
double→bigint CAST rounds, Spark truncates); the observation tie-break
is (ts, event_id) in both engines.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    tiebreak_col: str | None = None,
    max_buckets: int = 1_000_000,
    method: str = "locf",
) -> DataFrame:
    """Dense per-key time grid at ``bucket_seconds`` resolution over the
    input's global time range, with each bucket carrying the LAST
    observed value in that bucket (ties broken by ``tiebreak_col``) and
    empty buckets filled per ``method``:

    - ``"locf"`` (default): carried forward from the key's previous
      observation (null before the first — nothing to carry);
    - ``"linear"``: interpolated between the key's previous and next
      observed buckets, ``v_prev + (v_next - v_prev) * Δb/ΔB``; null
      outside the key's [first, last] observation span (no
      extrapolation). Costs one extra per-key window pass (the
      following-direction scan for the next observation).

    Returns (key_col, bucket_ts, value, filled): ``filled`` is true for
    gap rows the method produced a value for.

    Raises (at execution, via a lazy ``assert_true`` — building the
    plan launches ZERO jobs, the ivf_query discipline) if the global
    range spans more than ``max_buckets`` buckets — at cluster scale a
    silent n_keys × n_buckets explosion is the failure mode, so it must
    be loud.
    """
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
        .cast("bigint")
        .alias("_bucket")
    )
    obs = events.select(
        F.col(key_col),
        bucket,
        F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("_v"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("_tb"),
    )
    # last observation per (key, bucket): per-key window, never global
    w_last = Window.partitionBy(key_col, "_bucket").orderBy(
        F.col("_ts").desc(), F.col("_tb").desc()
    )
    per_bucket = (
        obs.withColumn("_rn", F.row_number().over(w_last))
        .where(F.col("_rn") == 1)
        .select(key_col, "_bucket", F.col("_v"))
    )
    # global bucket range: 1-row aggregate, broadcast to every key.
    # The guard is evaluated INSIDE the plan (empty input -> null range
    # -> vacuously fine -> empty sequence -> zero spine rows).
    guard = F.coalesce(
        (F.col("_hi") - F.col("_lo")) < F.lit(int(max_buckets)),
        F.lit(True),
    )
    # the assert is folded INTO the sequence's upper bound — a
    # free-standing guard column gets pruned away as unused (measured)
    rng = obs.agg(
        F.min("_bucket").alias("_lo"), F.max("_bucket").alias("_hi")
    ).select(
        "_lo",
        F.when(
            F.assert_true(
                guard,
                f"resample: bucket range exceeds max_buckets="
                f"{max_buckets}; widen bucket_seconds or raise the guard",
            ).isNull(),
            F.col("_hi"),
        ).alias("_hi"),
    )
    spine = (
        obs.select(key_col).distinct()
        .crossJoin(F.broadcast(rng))
        .select(
            key_col,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_bucket"),
        )
    )
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be 'locf' or 'linear': {method}")
    w_back = (
        Window.partitionBy(key_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(per_bucket, [key_col, "_bucket"], "left")
    ts_out = F.timestamp_seconds(F.col("_bucket") * bucket_seconds).alias(
        "bucket_ts"
    )
    if method == "locf":
        fill = F.last("_v", ignorenulls=True).over(w_back)
        return joined.select(
            F.col(key_col),
            ts_out,
            fill.alias("value"),
            (F.col("_v").isNull() & fill.isNotNull()).alias("filled"),
        )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy("_bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("_v").isNotNull(), F.col("_bucket"))
    pv = F.last("_v", ignorenulls=True).over(w_back)
    pb = F.last(obs_bucket, ignorenulls=True).over(w_back)
    nv = F.first("_v", ignorenulls=True).over(w_fwd)
    nb = F.first(obs_bucket, ignorenulls=True).over(w_fwd)
    lerp = pv + (nv - pv) * (
        (F.col("_bucket") - pb).cast("double") / (nb - pb).cast("double")
    )
    value = F.when(F.col("_v").isNotNull(), F.col("_v")).when(
        pv.isNotNull() & nv.isNotNull(), lerp
    )
    return joined.select(
        F.col(key_col),
        ts_out,
        value.alias("value"),
        (F.col("_v").isNull() & pv.isNotNull() & nv.isNotNull()).alias(
            "filled"
        ),
    )
