"""PageRank (operators/graph.py) — probability-mass, symmetry and
partitioning-invariance laws."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import graph
from play_with_pulsar_spark.operators.dedup import release_intermediates


def _pr(df):
    """Collect (node, pagerank) rows, then release the operator's
    registered localCheckpoint handles — the standard
    release_intermediates(result) contract; the storage-hygiene test
    in test_incremental_dedup asserts sessions stay clean, and
    un-released pagerank checkpoints were the one leak it caught."""
    rows = df.collect()
    release_intermediates(df)
    return rows


def _edges(spark, pairs):
    e0 = spark.createDataFrame(pairs, "src string, dst string")
    return e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_mass_conserved_and_star_center_wins(spark):
    # star: center c connected to 4 leaves (undirected)
    e = _edges(spark, [("c", f"l{i}") for i in range(4)])
    pr = {r["node"]: r["pagerank"] for r in _pr(graph.pagerank(e, iters=5))}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert all(pr["c"] > pr[f"l{i}"] for i in range(4))
    leaf_ranks = {round(pr[f"l{i}"], 12) for i in range(4)}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_ring_is_uniform(spark):
    nodes = [f"n{i}" for i in range(6)]
    e = _edges(spark, [(nodes[i], nodes[(i + 1) % 6]) for i in range(6)])
    pr = {r["node"]: r["pagerank"] for r in _pr(graph.pagerank(e, iters=4))}
    assert len({round(v, 12) for v in pr.values()}) == 1


def test_partitioning_invariance(spark):
    pairs = [(f"a{i}", f"b{i % 3}") for i in range(20)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, _pr(graph.pagerank(e, iters=3))))
    b = sorted(map(tuple, _pr(graph.pagerank(e.repartition(7), iters=3))))
    assert a == b


def test_zero_iters_is_uniform_init(spark):
    e = _edges(spark, [("x", "y"), ("y", "z")])
    pr = {r["node"]: r["pagerank"] for r in _pr(graph.pagerank(e, iters=0))}
    assert set(pr.values()) == {round(1.0 / 3, 14)}
