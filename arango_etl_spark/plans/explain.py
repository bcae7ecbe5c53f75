"""Physical-plan inspection helpers — the engine's own `.explain`
assertions (pushdown, broadcast, partial aggregation, codegen spans) so
plan quality is tested, not eyeballed."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    p = formatted_plan(df)
    return "PushedFilters: [" in p and "PushedFilters: []" not in p


def has_partition_filters(df: DataFrame) -> bool:
    """True when the parquet scan prunes hive partitions (PartitionFilters
    non-empty) — the scan never lists, let alone reads, other partitions."""
    p = formatted_plan(df)
    return "PartitionFilters: [" in p and "PartitionFilters: []" not in p


def pruned_columns(df: DataFrame) -> str:
    """The ReadSchema the parquet scan actually requests."""
    p = formatted_plan(df)
    for line in p.splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Two-phase hash aggregation (map-side combine before the shuffle)."""
    p = physical_plan(df)
    return p.count("HashAggregate") >= 2 or "partial" in p.lower()


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of window-family physical nodes with an EMPTY partition
    spec — each one moves EVERY row into a single task ("WindowExec: No
    Partition Defined", the round-3 VERDICT #1 scale-killer: a foldable
    literal partition key is constant-folded away by Catalyst). Walks
    the physical plan via py4j, descending through AQE wrappers."""
    hits = 0
    seen: list = [df._jdf.queryExecution().executedPlan()]
    while seen:
        node = seen.pop()
        name = node.getClass().getSimpleName()
        if name in (
            "WindowExec",
            "WindowGroupLimitExec",
            "WindowInPandasExec",
        ) and node.partitionSpec().isEmpty():
            hits += 1
        if name == "AdaptiveSparkPlanExec":
            seen.append(node.inputPlan())
        elif name.endswith("QueryStageExec"):
            seen.append(node.plan())
        children = node.children()
        for i in range(children.length()):
            seen.append(children.apply(i))
    return hits


def codegen_stage_count(df: DataFrame) -> int:
    p = physical_plan(df)
    # simpleString marks whole-stage-codegen operators with "*(id)";
    # formatted explain spells it out
    return max(p.count("WholeStageCodegen"), len(set(
        tok.split(")")[0] for tok in p.split("*(")[1:]
    )))
