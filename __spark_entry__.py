"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`play_with_pulsar_spark.queries`, the engine's
declared query registry (one entry per implemented operator from
SURVEY.md §2, each paired with its DuckDB oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from play_with_pulsar_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    production query (per-room scoreboard, ScoreboardFunction.java:18-58)
    mapped onto the events fixture."""
    return _q.a1_scoreboard_kills(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
