"""Local replica of the driver's Spark-vs-DuckDB comparison.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, schema (column names,
sorted) and an order-insensitive value hash. Used by the test suite so
oracle mismatches are caught before the driver runs.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .schema import DRIVER_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        # repr gives the shortest round-trip form — bitwise-equal
        # doubles stringify identically.
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    cols = sorted(df.columns)
    rows = [
        "|".join(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    spark_cols: list[str]
    oracle_cols: list[str]
    spark_hash: str
    oracle_hash: str

    @property
    def detail(self) -> str:
        return (
            f"{self.name}: rows {self.spark_rows} vs {self.oracle_rows}; "
            f"cols {self.spark_cols} vs {self.oracle_cols}; "
            f"hash {'==' if self.spark_hash == self.oracle_hash else '!='}"
        )


def compare(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    fn,
    oracle: str,
    con: duckdb.DuckDBPyConnection | None = None,
) -> ParityResult:
    res = fn(spark, sf_dir)
    sdf = res.toPandas()
    # long-lived comparison sessions (the test suite runs every
    # declared query in one SparkSession): free any persisted
    # intermediates riding the result, per the operators' contract
    from .operators.dedup import release_intermediates

    release_intermediates(res)
    own_con = con is None
    if own_con:
        con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(oracle).df()
    finally:
        if own_con:
            con.close()
    sn, sc, sh = frame_fingerprint(sdf)
    on, oc, oh = frame_fingerprint(odf)
    return ParityResult(name, sn == on and sc == oc and sh == oh, sn, on, sc, oc, sh, oh)
