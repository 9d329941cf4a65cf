"""Readers for the driver-provided fixture tables (TESTDATA.md).

All reads are plain ``spark.read.parquet`` — columnar scan with
predicate pushdown and column pruning handled by Catalyst. At 100 TB
these would be partitioned/bucketed tables behind a catalog; the query
code only ever sees DataFrames, so swapping the loader is the only
cluster-migration change.

Schema resolution (round 8): the schema is read from the parquet
FOOTER on the driver (pyarrow) and cached per (sf_dir, table) — a
schema-less ``spark.read.parquet`` launches a Spark job to infer it,
which made every declared query cost one job PER TABLE TOUCHED at
build time (measured: TPC-H-shaped entries paid up to 6). On a
cluster the schema comes from the catalog for free; this is the
stand-in, and it is what lets ``tests/test_plan_shape.py`` assert
that building a registry query triggers no job at all. Any footer the
arrow→Spark conversion cannot express falls back to one native
inference (cached too)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..schema import DRIVER_TABLES

# Parquet TIMESTAMP(NANOS) columns: Spark has no nanosecond timestamp
# type, so these are read as long (nanosAsLong) and truncated — not
# rounded, to match DuckDB's ns→µs conversion — to microseconds.
NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}

# (sf_dir, table) -> resolved read schema. Equality of the arrow-
# converted schema with Spark's own inference is pinned for every
# driver table in test_plan_shape.py.
_SCHEMA_CACHE: dict[tuple[str, str], StructType] = {}


def _table_schema(spark: SparkSession, path: str, key: tuple[str, str]) -> StructType:
    if key in _SCHEMA_CACHE:
        return _SCHEMA_CACHE[key]
    schema: StructType | None = None
    try:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        if os.path.isfile(path):
            arrow = pq.read_schema(path)
            # timestamp[ns] fields read as LONG under the engine's
            # nanosAsLong contract (Spark has no ns timestamp type),
            # but from_arrow_schema maps them to TimestampNTZ — which
            # would silently skip load_table's div-1000 conversion
            # (round 9 — r8 advice). Pin them to int64 so the footer
            # schema matches what the native read produces.
            for i, fld in enumerate(arrow):
                if pa.types.is_timestamp(fld.type) and fld.type.unit == "ns":
                    arrow = arrow.set(
                        i, pa.field(fld.name, pa.int64(), fld.nullable)
                    )
            schema = from_arrow_schema(arrow, prefer_timestamp_ntz=True)
    except Exception:
        schema = None
    if schema is None:  # directory dataset / unconvertible footer
        schema = spark.read.parquet(path).schema
    _SCHEMA_CACHE[key] = schema
    return schema


def parquet_schema(spark: SparkSession, path: str) -> StructType:
    """Resolved read schema of a parquet file/dir, footer-first and
    cached — the no-Spark-job path for fixture reads outside the
    driver-table set (game log, changelog, streamed fixtures)."""
    return _table_schema(spark, path, ("", path))


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced parquet read via :func:`parquet_schema` —
    zero jobs at build time once the (process-cached) schema is
    known."""
    return spark.read.schema(parquet_schema(spark, path)).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nano_cols = NANO_TS_COLS.get(name, [])
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.schema(_table_schema(spark, path, (sf_dir, name))).parquet(path)
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


# (path) -> schedulable scan units. Like _SCHEMA_CACHE this is footer
# metadata read once per process on the driver — no Spark job.
_SCAN_UNITS_CACHE: dict[str, int] = {}


def scan_units(path: str) -> int:
    """Independently schedulable scan units of a parquet file/dir:
    row groups summed over files. A parquet row group is the atomic
    unit a scan task can own — a table laid out as single-row-group
    files runs its scan stage on ONE core per file no matter what
    ``local[N]`` or ``maxPartitionBytes`` say, because splits that
    contain no row-group midpoint produce empty tasks. Unreadable
    footers report "plenty" (no spread) — the safe default, since the
    spread below is an optimization, never a correctness need."""
    if path in _SCAN_UNITS_CACHE:
        return _SCAN_UNITS_CACHE[path]
    units = 1 << 20  # assume splittable when we cannot prove otherwise
    try:
        import os

        import pyarrow.parquet as pq

        if os.path.isfile(path):
            units = pq.ParquetFile(path).metadata.num_row_groups
        elif os.path.isdir(path):
            units = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_row_groups
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ) or 1
    except Exception:
        pass
    _SCAN_UNITS_CACHE[path] = units
    return units


def spread_scan(df: DataFrame, spark: SparkSession, path: str, key: str = "doc_id") -> DataFrame:
    """Input-layout spread (guide §2.5 "input skew: one huge
    unsplittable file ... otherwise repartition immediately after the
    read"): when the input's parquet layout caps scan parallelism
    below the session's core count, hash-repartition the rows across
    ``defaultParallelism`` so the per-doc kernels downstream (token
    hashing, Arrow batch kernels, gram builds) use every core instead
    of riding a one-task scan stage.

    Scale-adaptive by construction, NOT a local-mode constant: the
    condition compares the input's actual row-group count against the
    session's parallelism, so a 100 TB table (thousands of row groups
    ≫ cores) passes through untouched — zero added exchange — while a
    pathological single-row-group layout gets the one small shuffle
    that unlocks the cluster. The spread key is the stable row id, so
    the exchange is deterministic under task retries (§2.5's rand()
    hazard does not apply) and downstream doc-keyed aggregations can
    reuse the partitioning when counts line up. Results are unchanged
    for every consumer in this engine: the kernels are per-doc maps or
    exact (int/decimal) aggregations, both partition-order-independent
    — float-order-sensitive consumers (EM fits, GD loops) deliberately
    do NOT take the spread."""
    if scan_units(path) >= spark.sparkContext.defaultParallelism:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism, key)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql use."""
    for t in DRIVER_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
