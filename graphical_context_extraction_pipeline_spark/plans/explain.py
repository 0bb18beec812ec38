"""Physical-plan inspection helpers — the engine's scale guarantees are
plan properties, so tests assert them instead of hoping:

- the extraction hot path must contain NO shuffle (Exchange) besides an
  explicit input repartition;
- small dimension joins must be broadcast, not sort-merge;
- parquet scans must show pushed filters / pruned schemas when a query
  touches one facet of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the physical plan (excludes broadcast)."""
    plan = physical_plan(df)
    return sum(
        line.count("Exchange ")
        for line in plan.splitlines()
        if "BroadcastExchange" not in line and "Exchange " in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    import re

    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            cols.extend(re.findall(r"(\w+):", line.split("ReadSchema", 1)[1]))
    return cols
