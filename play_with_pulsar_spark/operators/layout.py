"""Data-layout optimization: cluster files so scans can skip them.

At 100 TB the fastest bytes are the ones never read. Parquet stores
per-column min/max in footers/row-groups, and both Spark and every
lakehouse engine prune by them — but the stats only help if writers
CLUSTER rows so each file covers a narrow value range. This module is
the engine's OPTIMIZE step (the open-source analog of Delta/Iceberg's
`OPTIMIZE ... ZORDER BY`, expressed as plain DataFrame ops):

- ``cluster_by_range(df, cols, n_files)`` — one range exchange +
  in-partition sort; each output file covers a disjoint slice of the
  leading column. Perfect skipping for predicates on that column.
- ``z_value_2d(a, b)`` — bit-interleaved Morton code as a pure JVM
  expression; clustering by it bounds the per-file range of BOTH
  columns at once, so predicates on either dimension skip most files
  (the classic single-sort failure: the second column is uniform in
  every file and nothing is skippable).
- ``file_minmax_stats`` / ``files_matching_range`` — read-side audit:
  per-file min/max (exactly what the footers hold) and how many files
  a range predicate must touch. The tests assert skipping on these
  stats, which is the same decision procedure the scan makes.

Public-knowledge design: Morton/Z-order curves (Morton 1966) as used
by every columnar lakehouse; no proprietary system referenced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def z_value_2d(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints into a
    Morton code — a single sortable long where nearby (a, b) points
    get nearby codes. Pure JVM bit arithmetic (shifts + masks), so it
    lives inside whole-stage codegen like any other expression.

    Values are clamped to ``bits`` via masking; scale/offset inputs
    into [0, 2^bits) first if they exceed it (rank-transform for
    skewed domains).
    """
    mask = F.lit((1 << bits) - 1).cast("long")
    one = F.lit(1).cast("long")
    ca = (F.col(a) if isinstance(a, str) else a).cast("long").bitwiseAND(mask)
    cb = (F.col(b) if isinstance(b, str) else b).cast("long").bitwiseAND(mask)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(cb, i).bitwiseAND(one), 2 * i + 1))
    return z


def cluster_by_range(
    df: DataFrame, cols: list[str | Column], n_files: int, sort_within: bool = True
) -> DataFrame:
    """Rows range-partitioned into ``n_files`` slices of ``cols`` (one
    exchange, sampled range boundaries — skew-resistant) and sorted
    within each slice; write the result with one task per file. Each
    file then covers a narrow, near-disjoint range of the leading
    clustering expression — the property file-skipping needs."""
    parted = df.repartitionByRange(n_files, *cols)
    return parted.sortWithinPartitions(*cols) if sort_within else parted


def file_minmax_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max for ``cols`` — the audit view of what the
    parquet footers advertise to pruning. One narrow scan, one
    aggregation keyed by file."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def files_matching_range(stats: DataFrame, col: str, lo, hi) -> int:
    """How many files a scan with ``col BETWEEN lo AND hi`` must read,
    by the same interval-intersection rule footer pruning applies."""
    return stats.filter(
        (F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo))
    ).count()
