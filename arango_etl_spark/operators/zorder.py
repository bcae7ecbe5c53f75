"""Z-order (Morton) clustering: multi-dimensional zone-map layout.

Single-column ``cluster_by`` gives perfect file skipping on ONE column
and none on any other. Interleaving the bits of several columns into one
sort key (the Morton / Z-curve, Iceberg's and Delta's z-order rewrite)
makes every file cover a small HYPER-RECTANGLE of the combined space, so
per-file min/max zone maps prune usefully on EACH clustered column at
once — the layout a table queried by both time range and key range
needs at 100 TB, where re-clustering per query pattern is not an option.

Pure column expressions throughout (bit masks + shifts inside
whole-stage codegen — no UDFs): each column is rank-normalized to a
16-bit integer against its [min, max] bounds, then bit d of dimension i
lands at position ``d * n_dims + i`` of the key. Bounds come from one
column-pruned min/max aggregate (the same one-pass cost Iceberg's
rewrite action pays). NULLs normalize to 0 and sort first, like NULLS
FIRST. The key is at most ``16 * n_dims`` bits — a long up to 4 dims,
safe under ANSI arithmetic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BITS = 16


def _norm16(col: Column, lo, hi) -> Column:
    """Rank-normalize ``col`` into [0, 65535] against [lo, hi] bounds —
    degenerate bounds (lo == hi, or unknown on an all-null column) map
    everything to 0, which keeps the key total-ordered and harmless."""
    if lo is None or hi is None or hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(
        float((1 << _BITS) - 1)
    )
    clamped = F.least(
        F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << _BITS) - 1))
    )
    return F.coalesce(clamped.cast("long"), F.lit(0).cast("long"))


def zorder_key(norm_cols: list[Column], n_dims: int | None = None) -> Column:
    """Interleave the low 16 bits of each (already normalized) column:
    bit ``d`` of dimension ``i`` → key bit ``d * n + i``. 16·n terms of
    mask-and-shift, all inside codegen."""
    n = n_dims or len(norm_cols)
    if not 2 <= n <= 4:
        raise ValueError("z-order supports 2-4 dimensions")
    parts = []
    for i, c in enumerate(norm_cols):
        for d in range(_BITS):
            # bit at position d, shifted left by d*(n-1)+i, lands at d*n+i
            parts.append(
                F.shiftleft(c.bitwiseAND(F.lit(1 << d)), d * (n - 1) + i)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("_zorder")


def zorder_column(
    df: DataFrame, cols: list[str], schema: T.StructType | None = None
) -> Column:
    """Build the Z-order sort key for ``cols`` over ``df``: one
    column-pruned min/max aggregate for the bounds (a single driver row
    — bounded metadata), then the pure-expression interleave. Timestamp
    columns are normalized on unix micros."""
    schema = schema or df.schema
    dtypes = {f.name: f.dataType for f in schema.fields}

    def _as_num(c: str) -> Column:
        col = F.col(c)
        if isinstance(dtypes[c], T.TimestampType):
            return F.unix_micros(col)
        return col

    aggs = []
    for c in cols:
        aggs += [
            F.min(_as_num(c)).alias(f"_lo_{c}"),
            F.max(_as_num(c)).alias(f"_hi_{c}"),
        ]
    b = df.select(*aggs).collect()[0]
    norm = [
        _norm16(_as_num(c), b[f"_lo_{c}"], b[f"_hi_{c}"]) for c in cols
    ]
    return zorder_key(norm, len(cols))
