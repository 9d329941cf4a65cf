"""Readers for the driver-provided fixture tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` — columnar scan with
predicate pushdown and column pruning handled by Catalyst. At 100 TB
these would be partitioned/bucketed tables behind a catalog; the query
code only ever sees DataFrames, so swapping the loader is the only
cluster-migration change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import DRIVER_TABLES

# Parquet TIMESTAMP(NANOS) columns: Spark has no nanosecond timestamp
# type, so these are read as long (nanosAsLong) and truncated — not
# rounded, to match DuckDB's ns→µs conversion — to microseconds.
NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nano_cols = NANO_TS_COLS.get(name, [])
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nano_cols:
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Parquet timestamp[us] WITHOUT timezone reads as TIMESTAMP_NTZ in
    # Spark 4 (inferTimestampNTZ default). The engine and its DuckDB
    # oracles both treat fixture timestamps as UTC wall time (the
    # session tz is pinned to UTC in session.py), and several operators
    # use LTZ-only expressions (unix_micros, window). Normalize to the
    # session timestamp type at the scan boundary — a zero-cost cast
    # under UTC, and the one place a cluster deployment would adjust if
    # its fixtures carried real zones.
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql use."""
    for t in DRIVER_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
