"""Interval-containment (range) join — the temporal-join operator Spark
lacks natively at scale.

A bare ``f.ts >= i.start AND f.ts < i.end`` join predicate has no
equi-key, so Catalyst plans BroadcastNestedLoopJoin — every fact row is
tested against EVERY interval (O(n·m); with a non-broadcastable interval
side it degrades further to a cartesian). The standard scale shape
(Flink's interval join, Databricks' range-join optimization) is BIN
BUCKETING:

1. pick a bin width; every interval registers once per bin it overlaps
   (one ``explode(sequence(...))`` — map-side);
2. every fact row lands in exactly ONE bin (its timestamp's);
3. an equi-join on the bin key prunes candidates to intervals
   overlapping that bin, then the exact containment predicate filters.

Each (fact, interval) pair can only meet in the fact's single bin, so no
dedup is needed. The join is a plain hash equi-join: Spark broadcasts
the exploded interval side when small, else shuffles both sides on the
bin key — distributed either way, with skew bounded by interval density
per bin (tune ``bin_seconds`` toward the typical interval length: too
coarse → many false candidates per bin; too fine → interval×bins blowup).

Semantics are half-open ``[start, end)`` at millisecond precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
    how: str = "inner",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Join each fact row to every interval containing its timestamp
    (``start <= ts < end``). Returns facts' columns + intervals' columns.

    ``how`` is ``inner`` or ``left`` (left keeps unmatched facts with
    null interval columns). Both modes are ONE binned equi-join — left
    puts the containment predicate into the join condition of a
    left_outer join on the bin key, so Catalyst still extracts the
    equi-key (hash/sort-merge, never nested-loop) and the fact side is
    scanned exactly once (the round-4 dual-pass is gone: at 100 TB the
    fact side is the big one, and scanning + bin-hashing it twice
    doubled the dominant cost).

    Inverted intervals (``end <= start``) are EMPTY under half-open
    semantics: they register in zero bins (and so match nothing) rather
    than tripping ``sequence``'s step -1 descending fan-out.

    ``max_bins_per_interval`` guards the explode: one pathological
    interval (say a year-wide catch-all against 1-second bins) would
    silently fan out into millions of rows. The job FAILS FAST with a
    tune-the-bin-width message instead — raise the limit deliberately
    if the fan-out is intended."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    binw = F.lit(int(bin_seconds) * 1000)  # millis: sub-second-safe
    f_binned = facts.withColumn(
        "_bin", F.floor(F.unix_millis(F.col(ts_col)) / binw)
    )
    lo_bin = F.floor(F.unix_millis(F.col(start_col)) / binw)
    # end is EXCLUSIVE: an interval ending exactly on a bin boundary
    # must not register in the bin that starts there
    hi_bin = F.floor((F.unix_millis(F.col(end_col)) - 1) / binw)
    # guard order matters: the inverted-interval arm must come FIRST —
    # hi_bin < lo_bin makes (hi_bin - lo_bin) negative, which would pass
    # the fan-out guard and sequence(lo, hi) would infer step -1,
    # silently exploding a year-wide swapped pair into ~|lo-hi| rows
    # (ADVICE r4 #2). Empty interval → empty bin array → explode drops it.
    bins = (
        F.when(hi_bin < lo_bin, F.array().cast("array<bigint>"))
        .when(
            hi_bin - lo_bin < F.lit(int(max_bins_per_interval)),
            F.sequence(lo_bin, hi_bin),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "range_join: an interval spans more than "
                        f"{max_bins_per_interval} bins of "
                        f"{bin_seconds}s — widen bin_seconds (or "
                        "raise max_bins_per_interval) to match the "
                        "interval scale"
                    )
                )
            ).cast("array<bigint>")
        )
    )
    i_binned = intervals.withColumn("_bin", F.explode(bins))
    containment = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    if how == "inner":
        return (
            f_binned.join(i_binned, "_bin").where(containment).drop("_bin")
        )
    # left: ONE left_outer equi-join on the bin key with the containment
    # predicate inside the join condition — Catalyst still extracts _bin
    # as the equi-key (hash/sort-merge join), unmatched facts get their
    # null interval row for free, and the fact side is scanned once.
    i_renamed = i_binned.withColumnRenamed("_bin", "_ibin")
    return (
        f_binned.join(
            i_renamed,
            (F.col("_bin") == F.col("_ibin")) & containment,
            "left",
        )
        .drop("_bin", "_ibin")
    )
