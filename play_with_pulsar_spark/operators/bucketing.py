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
) -> None:
    """Materialize as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — with
    matching bucket counts the plan contains NO Exchange on either
    side (asserted in tests)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
