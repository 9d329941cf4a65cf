"""Physical-plan introspection: executable scale assertions.

The engine's performance contract is a set of plan properties —
filters reach the parquet scan, small dims broadcast, aggregations
partial-aggregate before their shuffle, no plan shuffles more than it
must. These helpers turn those properties into assertions the test
suite runs on every declared query, so a regression in plan shape
fails CI instead of surfacing as a 10× slowdown at cluster scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    pushed = pushed_filters(df)
    assert any(column in p for p in pushed), (
        f"no pushed filter on {column}; PushedFilters={pushed}"
    )


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — column-pruning check."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def assert_column_pruned(df: DataFrame, table_marker: str, absent_column: str) -> None:
    """Assert no scan whose schema mentions ``table_marker`` reads
    ``absent_column``."""
    for rs in read_schemas(df):
        if table_marker in rs:
            assert absent_column not in rs, f"{absent_column} not pruned: {rs}"


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def broadcast_hint_count(df: DataFrame) -> int:
    """FORCED broadcast hints (``F.broadcast(...)``) in the analyzed
    logical plan — distinct from what the planner or AQE *chooses* to
    broadcast from measured sizes. The engine's rule: a hint is only
    legitimate on a side that is bounded BY CONSTRUCTION (a 1-row
    aggregate, a limit-k table, a domain-sized group list) — never on
    a vocabulary- or type-sized table, whose size grows with the
    corpus (Heaps' law: 10⁸-10⁹ token types at the 25 T-token design
    point). Tests pin the expected hint count per query so an
    unbounded-side hint cannot creep back in."""
    return df._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint (strategy=broadcast)"
    )


def count_shuffles(df: DataFrame) -> int:
    """Exchange nodes in the plan (AQE may remove some at runtime —
    this is the static upper bound). Counts the formatted plan's
    per-node detail headers so each node is counted exactly once."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine active: the plan contains partial_* aggregate
    functions before the exchange (Hash- or SortAggregate both
    qualify)."""
    return "partial_" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen span count. Only visible in the simple plan
    as ``*(n)`` markers, and only when AQE has not wrapped the plan —
    callers should build the DataFrame with adaptive execution off."""
    return len(set(re.findall(r"\*\((\d+)\)", simple_plan(df))))
