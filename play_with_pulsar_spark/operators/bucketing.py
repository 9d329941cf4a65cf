"""Bucketed tables: co-located joins without a shuffle.

The 100 TB join strategy for fact-to-fact joins on a stable key
(lineitem ⋈ orders on orderkey; events ⋈ events on user): write both
sides bucketed AND sorted by the join key; every later join on that
key is a zero-exchange sort-merge of co-located buckets. This is the
batch analog of the reference's topic-per-room co-location
(pulsar.go:90-107): partition once at write time, never again at read
time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Materialize as a bucketed (and bucket-sorted) catalog table.

    With ``path`` the table is EXTERNAL: its files live at a stable
    location the caller owns, so the data outlives the session catalog
    (an in-memory catalog forgets the table name on restart, the files
    remain) and a later session can re-attach via
    ``register_bucketed``. DROP TABLE then removes only the catalog
    entry, never the files."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    schema: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Re-attach an external bucketed layout written by
    ``write_bucketed(..., path=...)`` to a (possibly fresh) session
    catalog — bucket metadata lives in the catalog, not the files, so
    a restart needs this DDL to keep getting shuffle-free probe joins
    on the stored index."""
    keylist = ", ".join(keys)
    sorted_by = f"SORTED BY ({keylist}) " if sort else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({schema}) USING PARQUET "
        f"CLUSTERED BY ({keylist}) {sorted_by}INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — with
    matching bucket counts the plan contains NO Exchange on either
    side (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
