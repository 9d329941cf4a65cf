"""Spark-upgrade canaries for the two private-API touchpoints.

Both seams degrade GRACEFULLY at runtime by design (a worker must
never fail to start; a cluster job must never crash on cleanup), which
means a pyspark upgrade that removes either API silently forfeits the
win instead of erroring. These tests are the loud failure: they pin
the exact attribute chains the production code reaches, so an upgrade
that breaks a seam breaks CI — not production throughput.

Seam 1 — ``spark_daemon`` (worker preload + invalidate_caches guard):
wraps ``pyspark.worker_util.setup_spark_files`` and re-binds the name
``pyspark.worker`` imported. Losing it re-instates a ~0.5 s/task zip
rescan plus a ~300 ms/worker pandas import (3-10x on Python stages).

Seam 2 — ``_free_local_checkpoint`` (dedup_clusters storage hygiene):
reaches ``df._jdf.queryExecution().analyzed().rdd()`` to unpersist a
localCheckpoint's blocks. Losing it accumulates up to max_iter label
tables in executor storage per clustering run.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_worker_util_setup_spark_files_exists():
    """spark_daemon's guard wraps this exact function; pyspark.worker
    must also bind it as a module global (the guard re-binds both)."""
    import pyspark.worker as w
    import pyspark.worker_util as wu

    assert callable(getattr(wu, "setup_spark_files", None)), (
        "pyspark.worker_util.setup_spark_files is gone — "
        "spark_daemon's invalidate_caches guard is now a no-op; "
        "re-port the guard to the new worker-setup entry point "
        "(play_with_pulsar_spark/spark_daemon.py)"
    )
    assert callable(getattr(w, "setup_spark_files", None)), (
        "pyspark.worker no longer binds setup_spark_files — "
        "spark_daemon's module-global re-bind no longer reaches the "
        "task loop (play_with_pulsar_spark/spark_daemon.py)"
    )


def test_pyspark_daemon_manager_exists():
    """spark_daemon delegates the fork protocol to pyspark.daemon's
    manager(); if it moves, the custom daemon cannot start and Spark
    falls back to spawning plain workers (conf error at session init)."""
    import pyspark.daemon as d

    assert callable(getattr(d, "manager", None)), (
        "pyspark.daemon.manager is gone — spark_daemon cannot delegate; "
        "update play_with_pulsar_spark/spark_daemon.py and session.py"
    )


def test_invalidate_caches_guard_installs():
    """The guard must still install against the live pyspark — i.e.
    its import-time probe path succeeds and the wrapper lands."""
    import pyspark.worker_util as wu

    from play_with_pulsar_spark import spark_daemon

    orig = wu.setup_spark_files
    try:
        spark_daemon._install_cache_invalidation_guard()
        assert wu.setup_spark_files is not orig, (
            "guard no longer wraps setup_spark_files — its probe path "
            "failed against this pyspark build"
        )
    finally:
        wu.setup_spark_files = orig
        import pyspark.worker as w

        if getattr(w, "setup_spark_files", None) is not orig:
            w.setup_spark_files = orig


def test_analyzed_plan_rdd_chain_exists(spark):
    """_free_local_checkpoint's exact py4j chain on a real
    localCheckpoint: queryExecution().analyzed().rdd().unpersist()."""
    df = spark.range(10).withColumn("x", F.col("id") * 2).localCheckpoint()
    try:
        jrdd = df._jdf.queryExecution().analyzed().rdd()
        jrdd.unpersist(False)
    except Exception as exc:  # noqa: BLE001 - the canary IS the catch
        raise AssertionError(
            "the _jdf.queryExecution().analyzed().rdd() chain broke on "
            f"this Spark build ({exc!r}) — _free_local_checkpoint in "
            "operators/dedup.py is now a silent no-op; find the new "
            "route to a LogicalRDD's backing RDD"
        ) from None


def test_fixture_contracts_null_ids_and_pair_endpoints(spark):
    """Round 13 (r12 verdict #4): two operator/oracle contracts are
    narrower than the fixture schema allows, pinned here so a fixture
    change cannot expose the divergence silently.

    (a) NULL doc_id: unigram_logprob (and bigram's original form)
    score per-doc behind an isnotnull(doc_id) boundary; since round 13
    the oracle SQL carries the same guard. Identical TODAY because no
    fixture doc has a NULL id — this asserts that premise at every SF.

    (b) pairs ⊆ docs: dedup_clusters iterates over edge endpoints only
    and documents the precondition that pair ids are docs ids (a
    foreign endpoint would participate in propagation). All callers
    construct pairs FROM docs; assert it end-to-end for the cheapest
    screen at the smallest SF."""
    import os

    from play_with_pulsar_spark.operators import dedup
    from play_with_pulsar_spark.sources.tables import load_table

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        docs = load_table(spark, d, "documents")
        assert docs.filter(F.col("doc_id").isNull()).limit(1).count() == 0, (
            f"{sf}: documents carries a NULL doc_id — the "
            "unigram/bigram scorers and their oracles now DIVERGE on "
            "this fixture (both exclude NULL-id docs; re-check every "
            "per-doc scorer before accepting the fixture)"
        )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    ids = docs.select(F.col("doc_id").alias("e"))
    foreign = (
        pairs.select(F.col("id_a").alias("e"))
        .unionByName(pairs.select(F.col("id_b").alias("e")))
        .join(ids, "e", "anti")
    )
    assert foreign.limit(1).count() == 0, (
        "near-dup pairs carry an endpoint outside docs — "
        "dedup_clusters' edge-nodes-only iteration would let it "
        "become a cluster label (see dedup.py dedup_clusters docstring)"
    )
