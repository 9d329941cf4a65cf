"""Salted operators == unsalted results; distributed connected
components == driver-side union-find."""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import dedup, skew
from play_with_pulsar_spark.oracle import dsum
from play_with_pulsar_spark.sources.tables import load_table


def test_salted_count_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type, r.n): None
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r.event_type, r.n): None
        for r in skew.salted_count(ev, ["event_type"], n_salts=16).collect()
    }
    assert plain == salted


def test_salted_sum_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type, r.total)
        for r in ev.groupBy("event_type").agg(dsum("value").alias("total")).collect()
    }
    salted = {
        (r.event_type, r.total)
        for r in skew.salted_sum(ev, ["event_type"], "value", n_salts=16).collect()
    }
    assert plain == salted  # exact decimal: bitwise equal despite salting


def test_salted_join_matches_plain(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(cu, "o_custkey").groupBy("c_mktsegment").count().collect()
    salted = (
        skew.salted_join(o, cu, "o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {(r.c_mktsegment, r["count"]) for r in plain} == {
        (r.c_mktsegment, r["count"]) for r in salted
    }


def test_connected_components_vs_union_find(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.8).cache()
    got = {
        r.doc_id: r.cluster for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    # driver-side union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    edges = [(r.id_a, r.id_b) for r in pairs.collect()]
    for a, b in edges:
        union(a, b)
    n_docs = docs.count()
    want = {i: min(find(i), i) if i in parent else i for i in range(n_docs)}
    # canonicalize: min member of each union-find root
    roots: dict[int, int] = {}
    for i in range(n_docs):
        r = find(i) if i in parent else i
        roots[r] = min(roots.get(r, i), i)
    want = {i: roots[find(i) if i in parent else i] for i in range(n_docs)}
    assert got == want
    pairs.unpersist()

def test_connected_components_deep_chain(spark):
    # Path graph of 200 nodes (diameter 199). Propagation + pointer
    # jumping covers doubling distance per round, so the default
    # max_iter=15 converges (2^15 >> 199) — and the per-round
    # localCheckpoint keeps the plan depth constant while doing it.
    n = 200
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "id_a long, id_b long, jaccard double"
    )
    persisted_before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    got = {
        r.doc_id: r.cluster
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # storage stays BOUNDED: per-round checkpoints are freed eagerly
    # (_free_local_checkpoint). If its private unpersist path silently
    # breaks, ~8 label-table copies leak here and this catches it.
    persisted_after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert persisted_after - persisted_before <= 3, (
        f"localCheckpoint blocks leaked: {persisted_before} -> {persisted_after}"
    )


def test_simhash_kernel_equals_grouped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fast = {r.doc_id: r.simhash for r in dedup.simhash64(docs).collect()}
    ref = {r.doc_id: r.simhash for r in dedup.simhash64_grouped(docs).collect()}
    assert fast == ref


def test_simhash_md5_hash_swap(spark, sf_dir):
    """The portable md5_60 hash (round 7 — what dedup_simhash_checked
    drives through the driver's hash gate) runs the SAME kernel:
    kernel == grouped reference under md5_60 too; the top 4 signature
    bits are constant 0 (60-bit hash); and both hash choices agree on
    the planted exact duplicates (hamming 0 — hash-independent),
    pinning that the two forms differ only in the token-hash
    expression."""
    docs = load_table(spark, sf_dir, "documents")
    fast = {r.doc_id: r.simhash for r in dedup.simhash64(docs, hash_fn="md5_60").collect()}
    ref = {
        r.doc_id: r.simhash
        for r in dedup.simhash64_grouped(docs, hash_fn="md5_60").collect()
    }
    assert fast == ref
    assert all(0 <= s < (1 << 60) for s in fast.values())
    import pytest

    with pytest.raises(ValueError, match="hash_fn"):
        dedup.simhash64(docs, hash_fn="sha9")
    # identical token multisets hash to identical signatures under ANY
    # hash — plant exact copies of 5 docs (fixture has no exact-text
    # dups) and require both hash choices to flag them at hamming 0;
    # other hamming-0 pairs are collision noise, legitimately
    # hash-dependent
    from pyspark.sql import functions as F

    copies = (
        docs.filter(F.col("doc_id") < 5)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    planted = docs.select("doc_id", "text").unionByName(copies)
    expect = {(i, i + 1_000_000) for i in range(5)}
    for kw in ({}, {"hash_fn": "md5_60"}):
        got = {
            (r.id_a, r.id_b)
            for r in dedup.simhash_near_pairs(planted, max_hamming=0, **kw).collect()
        }
        assert expect <= got, kw


def test_aqe_splits_skewed_join(spark):
    """The engine's skew story is AQE-first (session.py enables
    skewJoin) with manual salting as the fallback — prove AQE actually
    engages: a sort-merge join against a 1000:1-skewed key set must
    (a) produce exact results and (b) show skew handling in the final
    adaptive plan."""
    from pyspark.sql import functions as F

    big = (
        spark.range(300_000)
        .select(
            F.when(F.col("id") < 250_000, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(500)))
            .alias("k"),
            F.col("id").alias("v"),
        )
    )
    right = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        joined = big.join(right, "k")
        n = joined.count()
        assert n == 300_000
        # execute-then-inspect: the ADAPTIVE final plan marks the
        # skewed SMJ partition split
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_dedup_survivors_best_keeps_quality_not_min_id(spark):
    """Quality-aware retention (round 7): in a planted near-dup
    cluster whose LONGEST member has the LARGEST id, min-id retention
    keeps the truncated copy; dedup_survivors_best must keep the long
    original (ties fall back to min id); singletons always survive."""
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                      # truncated copy, smallest id
        (2, base + " lambda mu"),       # the long original, larger id
        (3, "totally unrelated text about completely other things"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    )
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1, 2)}
    best = {r.doc_id for r in dedup.dedup_survivors_best(docs, pairs, F.col("n_chars")).collect()}
    assert best == {2, 3}
    minid = {r.doc_id for r in dedup.dedup_survivors(docs, pairs).collect()}
    assert minid == {1, 3}  # the policy difference is real
    # tie on score -> min id
    tied = docs.withColumn("n_chars", F.lit(7))
    t = {r.doc_id for r in dedup.dedup_survivors_best(tied, pairs, F.col("n_chars")).collect()}
    assert t == {1, 3}


def test_incremental_simhash_equals_batch_restricted_full(spark, sf_dir):
    """Incremental-screen law (round 7): probing the stored signature
    index with a new batch yields EXACTLY the full-corpus pair set
    restricted to pairs touching the batch — for both hash choices;
    index=None degenerates to within-batch pairs; no index x index
    pair ever leaks."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for kw in ({}, {"hash_fn": "md5_60"}):
        full = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.simhash_near_pairs(docs, max_hamming=3, **kw).collect()
        }
        want = {(a, b, h) for a, b, h in full if a % 5 == 0 or b % 5 == 0}
        index_sigs = dedup.simhash64(docs.filter(F.col("doc_id") % 5 != 0), **kw)
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in dedup.incremental_simhash_pairs(
                index_sigs, docs.filter(F.col("doc_id") % 5 == 0), max_hamming=3, **kw
            ).collect()
        }
        assert got == want, kw
        assert all(a % 5 == 0 or b % 5 == 0 for a, b, _ in got)
        within = {
            (r.id_a, r.id_b)
            for r in dedup.incremental_simhash_pairs(
                None, docs.filter(F.col("doc_id") % 5 == 0), max_hamming=3, **kw
            ).collect()
        }
        assert within == {
            (a, b) for a, b, _ in full if a % 5 == 0 and b % 5 == 0
        }, kw


def test_rotated_simhash_coverage_and_quarter_equivalence(spark, sf_dir):
    """Manku multi-rotation screen laws (round 8):

    - coverage is pigeonhole-EXACT: the radius-6 rotated screen
      equals brute-force hamming <= 6 pairs restricted to the batch
      (all-pairs computed directly on the signatures — fixture-sized);
    - blocks=4, radius=3 reproduces the quarter scheme's results;
    - index=None degenerates to within-batch pairs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = dedup.simhash64(docs, hash_fn="md5_60")
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            dedup.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .collect()
    }
    want = {(x, y, h) for x, y, h in brute if x % 5 == 0 or y % 5 == 0}
    index_keys = dedup.simhash_rotation_keys(
        dedup.simhash64(docs.filter(F.col("doc_id") % 5 != 0), hash_fn="md5_60"),
        blocks=8, radius=6,
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.incremental_simhash_pairs_rotated(
            index_keys, docs.filter(F.col("doc_id") % 5 == 0),
            blocks=8, radius=6, hash_fn="md5_60",
        ).collect()
    }
    assert got == want and got  # non-vacuous on the fixture
    # quarter equivalence at (blocks=4, radius=3)
    quarter = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.incremental_simhash_pairs(
            dedup.simhash64(docs.filter(F.col("doc_id") % 5 != 0), hash_fn="md5_60"),
            docs.filter(F.col("doc_id") % 5 == 0),
            max_hamming=3, hash_fn="md5_60",
        ).collect()
    }
    rotated4 = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.incremental_simhash_pairs_rotated(
            dedup.simhash_rotation_keys(
                dedup.simhash64(
                    docs.filter(F.col("doc_id") % 5 != 0), hash_fn="md5_60"
                ),
                blocks=4, radius=3,
            ),
            docs.filter(F.col("doc_id") % 5 == 0),
            blocks=4, radius=3, hash_fn="md5_60",
        ).collect()
    }
    assert rotated4 == quarter
    # no index: within-batch only
    within = {
        (r.id_a, r.id_b)
        for r in dedup.incremental_simhash_pairs_rotated(
            None, docs.filter(F.col("doc_id") % 5 == 0),
            blocks=8, radius=6, hash_fn="md5_60",
        ).collect()
    }
    assert within == {(x, y) for x, y, _ in brute if x % 5 == 0 and y % 5 == 0}
