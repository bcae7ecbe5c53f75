"""Salted repartitioning for hot-key skew (north rule: "salted-repartitioned
on hash(doc_id) to defeat hot-key skew from dominant sources").

Where each technique applies in this engine:

- **Aggregation skew** (dedup): solved WITHOUT salting by partial
  aggregation (max_by pre-reduces per input partition) or by Catalyst's
  WindowGroupLimit for the window form — see operators/dedup_window.py.
  The explicit two-phase salted window is there for parity.
- **Shuffle/write skew** (one hot bucket = one writer task): solved here —
  `salted_repartition` spreads a hot partition key over `salt_n` tasks
  while keeping downstream partitionBy grouping intact (more files per
  hot bucket, but parallel writers).
- **Join skew** (MERGE join on doc_id): AQE skew-join splitting
  (spark.sql.adaptive.skewJoin.enabled, on by default in get_spark) —
  salting a join requires replicating the other side, which AQE does
  adaptively without the replication cost when skew is absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(salt_n: int, *entropy_cols: Column) -> Column:
    """Deterministic salt in [0, salt_n) from row content (not rand() —
    replays must be byte-identical)."""
    return F.pmod(F.xxhash64(*entropy_cols), F.lit(salt_n)).cast("int")


def salted_repartition(
    df: DataFrame,
    key_col: str,
    n_partitions: int,
    salt_n: int = 8,
    entropy_cols: list[str] | None = None,
) -> DataFrame:
    """Hash-repartition on (key, salt): rows of one hot key spread over up
    to ``salt_n`` partitions. Use when the next operation is per-row
    (write, map) — NOT before an exact per-key aggregation, which would
    then need a second combine phase."""
    entropy = entropy_cols or [c for c in df.columns if c != key_col]
    salted = df.withColumn(
        "_salt", salt_expr(salt_n, *[F.col(c) for c in entropy])
    )
    return salted.repartition(n_partitions, F.col(key_col), F.col("_salt")).drop(
        "_salt"
    )
