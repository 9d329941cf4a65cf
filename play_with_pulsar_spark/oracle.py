"""Helpers that keep Spark results bitwise-comparable to a DuckDB oracle.

Floating-point sums are order-dependent; a distributed sum and a
single-threaded oracle sum of the same doubles can differ in the last
few ulps, which breaks value-hash comparison. The fix used throughout
the declared queries: compute per-row expressions in DOUBLE (bitwise
deterministic — no reduction involved), cast to DECIMAL, SUM exactly
(decimal addition is associative, so partition order cannot matter),
and cast the final aggregate back to DOUBLE. Both engines then produce
the identical double, at any parallelism — which is also exactly the
property you want on a 1000-executor cluster: results that don't
change run-to-run.

Averages are expressed as exact-decimal-sum / count with the division
done in DOUBLE (identical in both engines), never as a decimal
division (engines disagree on result scale rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str, count_col: Column | None = None) -> Column:
    """avg = exact-sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    n = count_col if count_col is not None else F.count(c)
    return F.sum(c.cast(DEC)).cast("double") / n


def sql_dsum(expr: str) -> str:
    """The DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str, count_expr: str = "COUNT(*)") -> str:
    return f"{sql_dsum(expr)} / {count_expr}"
