"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the most recent right-side value at or before
the left row's timestamp, per key. Implemented as a composition of
built-in ops (no applyInPandas/merge_asof needed): union both sides,
then `last(value, ignorenulls=True)` over a per-key window ordered by
(ts, tiebreak) — one shuffle, codegen-friendly, skew handled by AQE.

At 100 TB this beats the per-group pandas `merge_asof` fallback: the
window is a single sort-based pass per key partition, and the right side
never needs to be broadcast or replicated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + latest right ``value_cols`` at-or-before ``ts_col``.

    ``tiebreak_col`` orders rows sharing a timestamp (right rows with the
    same ts as a left row are visible to it when their tiebreak sorts
    earlier — inclusive as-of semantics).
    """
    clobbered = [v for v in value_cols if v in left.columns]
    if clobbered:
        raise ValueError(
            f"value_cols {clobbered} already exist on the left side; "
            f"rename them or choose a different suffix mapping"
        )
    l_tag = left.withColumn("_is_left", F.lit(1))
    for v in value_cols:
        l_tag = l_tag.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    synthesized_tiebreak = bool(tiebreak_col) and tiebreak_col not in left.columns
    if synthesized_tiebreak:
        # one-sided tiebreak (right only): null-fill the left side; nulls
        # sort LAST below so same-ts right rows stay visible (inclusive)
        l_tag = l_tag.withColumn(
            tiebreak_col, F.lit(None).cast(right.schema[tiebreak_col].dataType)
        )
    r_tag = right.select(
        *key_cols, ts_col,
        *( [tiebreak_col] if tiebreak_col else [] ),
        *value_cols,
    ).withColumn("_is_left", F.lit(0))
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    order: list[Column] = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc_nulls_last())
    # right rows sort before left rows at identical (ts, tiebreak):
    # inclusive as-of
    order.append(F.col("_is_left"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for v in value_cols:
        out = out.withColumn(
            f"{v}{suffix}", F.last(v, ignorenulls=True).over(w)
        )
    drop_cols = ["_is_left", *value_cols]
    if synthesized_tiebreak:
        # the all-null tiebreak column was synthesized for ordering only —
        # it must not leak into the output schema
        drop_cols.append(tiebreak_col)
    return out.where(F.col("_is_left") == 1).drop(*drop_cols)
