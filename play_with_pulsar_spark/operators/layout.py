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


def zorder_slice_stats(
    df: DataFrame,
    a: Column | str,
    b: Column | str,
    bits: int = 8,
    slice_bits: int = 4,
) -> DataFrame:
    """Audit view of a Z-order layout WITHOUT a global sort: bucket
    rows by the top ``slice_bits`` bits of their Morton code (equal-
    width z ranges — a pure projection, so the only exchange at any
    scale is the final slice-keyed aggregation) and report each
    slice's row count and per-dimension min/max envelope.

    The Morton property made queryable: the top 2k bits of z are the
    top k bits of BOTH dimensions interleaved, so every slice confines
    each dimension to a 2^(bits - ceil(slice_bits/2))-wide (resp.
    floor) band — the bounded box that lets a scan with a predicate on
    EITHER column skip most slices/files. Compare: range-partitioning
    on one column alone leaves the other spanning its full domain in
    every file (tests pin exactly this contrast).

    Inputs must already be non-negative ints < 2^bits (mask/rank
    upstream, as with ``z_value_2d``)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = z_value_2d(ca.alias("_a"), cb.alias("_b"), bits=bits)
    slc = F.shiftright(z, 2 * bits - slice_bits).alias("slice")
    return (
        df.select(slc, ca.alias("_a"), cb.alias("_b"))
        .groupBy("slice")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_a").alias("min_a"),
            F.max("_a").alias("max_a"),
            F.min("_b").alias("min_b"),
            F.max("_b").alias("max_b"),
        )
    )


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


def dataset_fingerprint(
    df: DataFrame, cols: list[str], null_sentinel: str = "\x00"
) -> DataFrame:
    """One-row content fingerprint of a dataset over an explicit
    column list: (n_rows, fp) where fp is the EXACT decimal sum of a
    60-bit md5 prefix of each row's canonical serialization.

    The audit primitive data versioning needs at 100 TB: verify that a
    copy, a migration, or a rewrite preserved content WITHOUT moving
    or sorting either side — the fingerprint is order- and
    partitioning-insensitive (a commutative sum), computed in one
    map-side-combined aggregate over the scan, and engine-portable
    (md5 + decimal sum — the DuckDB oracle reproduces it bit-for-bit,
    which is also what makes cross-engine migration checks possible).

    Canonical serialization: each column cast to string, nulls
    replaced by ``null_sentinel``, joined with the 0x1f unit
    separator — explicit casts only, so the caller controls (and the
    docstring of their pipeline records) the textual form of floats/
    decimals. Collision bound: 60-bit prefixes summed exactly — a
    corrupted row pair collides with probability ~2^-60 per
    comparison, the usual content-audit regime."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(null_sentinel)) for c in cols
    ]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    # fp travels as a STRING: a 70+-bit decimal survives any client
    # bridge (pandas would silently degrade DECIMAL(38,0) to float64)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).cast("decimal(38,0)").cast("string").alias("fp"),
    )


def _row_hash(cols: list[str], null_sentinel: str = "\x00") -> Column:
    """The canonical row hash shared by ``dataset_fingerprint`` and
    ``snapshot_diff``: md5 prefix (15 hex chars) of the
    unit-separator-joined string casts. Engine-portable."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(null_sentinel)) for c in cols
    ]
    return F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15)


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    cols: list[str],
    null_sentinel: str = "\x00",
) -> DataFrame:
    """Row-level diff between two dataset snapshots keyed by ``key``:
    which rows were ``added`` / ``removed`` / ``changed`` from
    snapshot ``a`` to snapshot ``b`` (unchanged rows are dropped).
    Output: (key, status, hash_a, hash_b) with the canonical row
    hashes (NULL on the side the key is absent from).

    ``dataset_fingerprint`` answers "are these snapshots identical"
    with one scalar per side; this answers the follow-up "WHAT
    diverged" — the audit a migration/backfill postmortem needs.

    Plan: each side reduces to a (key, hash) projection on its scan
    (columns beyond ``cols``+key are pruned), then ONE full outer
    join on the key — the minimum movement a keyed diff admits. If
    both snapshots are stored bucketed by the key, even that exchange
    disappears; the status column is a scalar projection. Content
    hashing uses the same canonical serialization as
    ``dataset_fingerprint``, so a diff verdict and a fingerprint
    verdict can never disagree about equality."""
    ha = a.select(
        F.col(key), _row_hash(cols, null_sentinel).alias("hash_a")
    )
    hb = b.select(
        F.col(key), _row_hash(cols, null_sentinel).alias("hash_b")
    )
    j = ha.join(hb, key, "full")
    status = (
        F.when(F.col("hash_b").isNull(), F.lit("removed"))
        .when(F.col("hash_a").isNull(), F.lit("added"))
        .when(F.col("hash_a") != F.col("hash_b"), F.lit("changed"))
    )
    return (
        j.select(F.col(key), status.alias("status"), "hash_a", "hash_b")
        .filter(F.col("status").isNotNull())
    )
