"""File-skipping layout tests (operators/layout.py).

The assertions run the same interval-intersection rule parquet footer
pruning applies, over the actual per-file min/max of written files —
so "this layout skips" is measured, not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import layout


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    # two independent-ish int columns with wide domains
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .withColumn("l_orderkey", F.col("l_orderkey").cast("long"))
    )


N_FILES = 8


def _bounds(df, col):
    r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    return r["lo"], r["hi"]


def test_range_clustering_prunes_leading_column(spark, li, tmp_path):
    p = str(tmp_path / "by_orderkey")
    layout.cluster_by_range(li, ["l_orderkey"], N_FILES).write.parquet(p)
    stats = layout.file_minmax_stats(spark, p, ["l_orderkey", "l_partkey"])
    assert stats.count() == N_FILES
    lo, hi = _bounds(li, "l_orderkey")
    width = (hi - lo) // 20 or 1
    # a 5% range on the clustered column touches ~1 slice (+1 for a
    # boundary straddle); the unclustered column is uniform per file
    # and nothing is skippable — the single-sort failure mode
    assert layout.files_matching_range(stats, "l_orderkey", lo, lo + width) <= 2
    plo, phi = _bounds(li, "l_partkey")
    pw = (phi - plo) // 20 or 1
    assert layout.files_matching_range(stats, "l_partkey", plo, plo + pw) == N_FILES


def test_zorder_prunes_both_columns(spark, li, tmp_path):
    # rank-transform both domains into [0, 2^10) so the Morton code
    # sees balanced bits, then cluster by the interleaved value
    bits = 10
    ok_lo, ok_hi = _bounds(li, "l_orderkey")
    pk_lo, pk_hi = _bounds(li, "l_partkey")
    scaled = li.select(
        "l_orderkey",
        "l_partkey",
        layout.z_value_2d(
            ((F.col("l_orderkey") - ok_lo) * ((1 << bits) - 1) / (ok_hi - ok_lo)).cast("long"),
            ((F.col("l_partkey") - pk_lo) * ((1 << bits) - 1) / (pk_hi - pk_lo)).cast("long"),
            bits=bits,
        ).alias("z"),
    )
    p = str(tmp_path / "by_z")
    layout.cluster_by_range(scaled, ["z"], N_FILES).write.parquet(p)
    stats = layout.file_minmax_stats(spark, p, ["l_orderkey", "l_partkey"])
    # a ~6% range on EITHER dimension now skips roughly half the files
    # (single-column sort gives 8/8 on the second dimension). +1 slack:
    # repartitionByRange SAMPLES its boundaries with an RDD-id-seeded
    # sampler, so slice edges jitter by one file between sessions.
    w_ok = (ok_hi - ok_lo) // 16 or 1
    w_pk = (pk_hi - pk_lo) // 16 or 1
    bound = N_FILES // 2 + 1
    assert layout.files_matching_range(stats, "l_orderkey", ok_lo, ok_lo + w_ok) <= bound
    assert layout.files_matching_range(stats, "l_partkey", pk_lo, pk_lo + w_pk) <= bound


def test_z_value_locality_golden(spark):
    """Morton-code golden: interleaving is exact and order-preserving
    on a known grid."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 3)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", layout.z_value_2d("a", "b", bits=4).alias("z")).collect()
    }
    # z = interleave(a into even bits, b into odd bits)
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 2): 12, (3, 3): 15}


def test_zorder_slice_stats_bounded_box(spark, li):
    """Round-7 audit operator: equal-width z-slices confine BOTH
    dimensions to a quarter of their domain (slice_bits=4 → top 2 bits
    of each dim pinned per slice), while single-column bucketing
    leaves the other dimension spanning its full range — the exact
    contrast file-skipping stands on, asserted on the aggregate the
    declared query (layout_zorder_slices) returns."""
    pts = li.select(
        (F.col("l_orderkey") % 256).alias("a"), (F.col("l_partkey") % 256).alias("b")
    )
    rows = layout.zorder_slice_stats(pts, "a", "b", bits=8, slice_bits=4).collect()
    assert sum(r.n_rows for r in rows) == pts.count()
    for r in rows:
        assert r.max_a - r.min_a <= 63, r  # 256/4 per dim
        assert r.max_b - r.min_b <= 63, r
    # contrast: bucket by a alone (equal-width) → b unconstrained
    single = (
        pts.groupBy(F.shiftright(F.col("a"), 4).alias("slice"))
        .agg(F.min("b").alias("min_b"), F.max("b").alias("max_b"))
        .collect()
    )
    assert all(r.max_b - r.min_b > 200 for r in single)


def test_dataset_fingerprint_invariance_and_sensitivity(spark, sf_dir):
    """Round-6 audit primitive: the fingerprint is invariant to row
    order and partitioning (commutative sum) and flips on a single
    corrupted cell — the copy-verification contract."""
    from play_with_pulsar_spark.operators.layout import dataset_fingerprint
    from play_with_pulsar_spark.sources.tables import load_table

    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    o = load_table(spark, sf_dir, "orders").select(*cols)
    base = dataset_fingerprint(o, cols).collect()[0]
    shuffled = dataset_fingerprint(
        o.repartition(17).sortWithinPartitions("o_custkey"), cols
    ).collect()[0]
    assert (base.n_rows, base.fp) == (shuffled.n_rows, shuffled.fp)
    corrupted = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") == 1, F.col("o_custkey") + 1).otherwise(
            F.col("o_custkey")
        ),
    )
    bad = dataset_fingerprint(corrupted, cols).collect()[0]
    assert bad.n_rows == base.n_rows and bad.fp != base.fp


def test_dataset_fingerprint_additive_over_partitions(spark, sf_dir):
    """fp(A ∪ B) = fp(A) + fp(B) for disjoint row sets — the law that
    makes incremental (per-ingested-batch) audit maintenance work."""
    from decimal import Decimal

    from play_with_pulsar_spark.operators.layout import dataset_fingerprint
    from play_with_pulsar_spark.sources.tables import load_table

    cols = ["o_orderkey", "o_orderstatus"]
    o = load_table(spark, sf_dir, "orders").select(*cols)
    a = o.filter(F.col("o_orderkey") % 3 == 0)
    b = o.filter(F.col("o_orderkey") % 3 != 0)
    whole = dataset_fingerprint(o, cols).collect()[0]
    fa = dataset_fingerprint(a, cols).collect()[0]
    fb = dataset_fingerprint(b, cols).collect()[0]
    assert whole.n_rows == fa.n_rows + fb.n_rows
    assert Decimal(whole.fp) == Decimal(fa.fp) + Decimal(fb.fp)


def test_snapshot_diff_laws(spark, sf_dir):
    """Identity (diff(a,a) == empty), inverse (swapping sides flips
    added<->removed, changed stays changed), and planted-edit
    detection with exact ids — plus agreement with the fingerprint:
    a non-empty diff implies unequal fingerprints."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = ["text", "lang", "source"]

    assert layout.snapshot_diff(docs, docs, "doc_id", cols).count() == 0

    b = (
        docs.filter(F.col("doc_id") != 7)  # remove id 7
        .select(
            "doc_id",
            F.when(F.col("doc_id") == 11, F.lit("edited")).otherwise(
                F.col("text")
            ).alias("text"),
            "lang",
            "source",
        )
        .unionByName(
            docs.filter(F.col("doc_id") == 3).select(
                F.lit(999_999).alias("doc_id"), "text", "lang", "source"
            )
        )
    )
    fwd = {(r.doc_id, r.status) for r in layout.snapshot_diff(docs, b, "doc_id", cols).collect()}
    assert fwd == {(7, "removed"), (11, "changed"), (999_999, "added")}
    rev = {(r.doc_id, r.status) for r in layout.snapshot_diff(b, docs, "doc_id", cols).collect()}
    assert rev == {(7, "added"), (11, "changed"), (999_999, "removed")}

    fa = layout.dataset_fingerprint(docs, cols).first()
    fb = layout.dataset_fingerprint(b.select("doc_id", *cols), cols).first()
    assert fa.fp != fb.fp
