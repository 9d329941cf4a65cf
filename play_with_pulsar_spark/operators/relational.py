"""Declared relational operator surface (SURVEY §2.12).

The reference planned full SQL over its topics (game-code/TODO.md:15,
"Use Pulsar sql to query" — unchecked); this engine supplies it as
Spark SQL / DataFrame plans. Everything here is a Catalyst built-in —
the functions exist to *declare* the shapes the engine supports and
give each one a place for its scale annotation; no custom execution.

Conventions: money aggregates go through exact decimal accumulation
(``oracle.dsum``) so results are bitwise reproducible at any
parallelism; dimension tables are explicitly broadcast where the
shape guarantees smallness; every group-by key is the minimal one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..oracle import dsum


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event exceeds ``gap_seconds``. Two window
    passes over the same (user, ts) partitioning — one shuffle total;
    comparisons in exact integer microseconds."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = gap_seconds * 1_000_000
    marked = events.withColumn(
        "_new",
        (F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us)).cast("int"),
    )
    with_sid = marked.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def pivot_counts(
    df: DataFrame, group_col: Column | str, pivot_col: str, values: list[str]
) -> DataFrame:
    """Pivot with an explicit value list (never the inferred one — an
    extra scan and a nondeterministic column order at scale); missing
    cells coalesce to 0 for changelog-friendly output."""
    p = df.groupBy(group_col).pivot(pivot_col, values).agg(F.count(F.lit(1)))
    return p.select(
        *[c for c in p.columns if c not in values],
        *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in values],
    )


def conditional_ratio(cond: Column, value: Column) -> Column:
    """TPC-H Q14 shape: 100 * sum(value where cond) / sum(value) with
    exact decimal sums, double division."""
    return (
        F.lit(100.0)
        * dsum(F.when(cond, value).otherwise(F.lit(0.0)))
        / dsum(value)
    )
