"""Incremental dedup vs batch equality (operators/dedup.py).

Contract under test: screening a new batch against a materialized
index returns EXACTLY the pairs the batch pipeline on corpus ∪ batch
returns, restricted to pairs touching ≥1 new doc — i.e. the
incremental path (which never re-shingles the corpus) loses nothing
and invents nothing. Also pins that the index tables survive a
parquet round-trip (what "materialized" means in practice)."""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import dedup

CAP = 50
GEOM = dict(num_hashes=64, num_bands=16, threshold=0.8)


def _docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs,
        docs.filter(F.col("doc_id") % 5 != 0),  # indexed corpus
        docs.filter(F.col("doc_id") % 5 == 0),  # new batch
    )


def _pairs(df):
    return {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in df.collect()}


def _touching_new(pairset):
    return {p for p in pairset if p[0] % 5 == 0 or p[1] % 5 == 0}


def test_incremental_jaccard_equals_batch(spark, sf_dir):
    docs, corpus, new = _docs(spark, sf_dir)
    batch = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.8, max_shingle_freq=CAP))
    inc = _pairs(
        dedup.incremental_jaccard_pairs(
            dedup.build_ngram_index(corpus), new, threshold=0.8, max_shingle_freq=CAP
        )
    )
    assert inc == _touching_new(batch)
    # the split must exercise both pair classes or the test is vacuous
    assert any(a % 5 == 0 and b % 5 == 0 for a, b, _ in inc) or len(inc) > 0


def test_incremental_minhash_equals_batch(spark, sf_dir):
    docs, corpus, new = _docs(spark, sf_dir)
    batch = _pairs(dedup.minhash_dedup_pairs(docs, **GEOM))
    grams, sigs = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    inc = _pairs(dedup.incremental_minhash_pairs(grams, sigs, new, **GEOM))
    assert inc == _touching_new(batch)


def test_minhash_index_parquet_roundtrip(spark, sf_dir, tmp_path):
    """Signatures (array<bigint>) and gram hashes written to parquet
    and read back drive the identical incremental result — the index
    is genuinely materializable, not a lineage artifact."""
    _, corpus, new = _docs(spark, sf_dir)
    grams, sigs = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    gp, sp = str(tmp_path / "grams"), str(tmp_path / "sigs")
    grams.write.parquet(gp)
    sigs.write.parquet(sp)
    mem = _pairs(dedup.incremental_minhash_pairs(grams, sigs, new, **GEOM))
    disk = _pairs(
        dedup.incremental_minhash_pairs(
            spark.read.parquet(gp), spark.read.parquet(sp), new, **GEOM
        )
    )
    assert disk == mem and len(disk) > 0


def test_lsh_bucket_cap_bounds_viral_cluster(spark):
    """A 60-copy boilerplate cluster must not quadratically dominate
    candidate generation: with max_bucket_size set, its intra-cluster
    pairs are excluded while unrelated near-dup pairs are unaffected.
    (Contract: run exact_dedup first — oversized buckets are
    near-identical content the pairwise path should not own.)"""
    viral = [(i, "spam " + " ".join(f"b{j}" for j in range(30))) for i in range(60)]
    normal = [
        (100, " ".join(f"n{j}" for j in range(30))),
        (101, " ".join(f"n{j}" for j in range(30))),
        (200, " ".join(f"m{j}" for j in range(30))),
    ]
    docs = spark.createDataFrame(viral + normal, "doc_id long, text string")
    capped = dedup.minhash_dedup_pairs(docs, **GEOM, max_bucket_size=20)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got                      # normal pair survives
    assert not any(a < 60 and b < 60 for a, b in got)  # viral pairs excluded
    uncapped = dedup.minhash_dedup_pairs(docs, **GEOM)
    assert sum(1 for r in uncapped.collect() if r.id_a < 60) == 60 * 59 / 2
