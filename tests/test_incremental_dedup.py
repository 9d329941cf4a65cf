"""Incremental dedup vs batch equality (operators/dedup.py).

Contract under test: screening a new batch against a materialized
index returns EXACTLY the pairs the batch pipeline on corpus ∪ batch
returns, restricted to pairs touching ≥1 new doc — i.e. the
incremental path (which never re-shingles the corpus) loses nothing
and invents nothing. Also pins that the index tables survive a
parquet round-trip (what "materialized" means in practice)."""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import dedup, similarity

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


def test_stored_bucketed_minhash_index_probe(spark, sf_dir):
    """write_minhash_index → probe via the stored bucketed tables:
    (a) identical result to the inline screen, (b) the candidate join
    reads the corpus-side banded table with NO Exchange above its
    scan (the batch side broadcasts), (c) with broadcast disabled the
    only Exchange belongs to the batch side — the corpus bucketing is
    what the sort-merge join consumes."""
    from play_with_pulsar_spark import plans

    docs, corpus, new = _docs(spark, sf_dir)
    grams, sigs = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    try:
        dedup.write_minhash_index(grams, sigs, "pwp_test_mhidx",
                                  num_bands=GEOM["num_bands"], rows_per_band=4)
    finally:
        grams.unpersist()
    stored_grams, stored_banded = dedup.read_minhash_index(spark, "pwp_test_mhidx")
    try:
        inline = _pairs(dedup.incremental_minhash_pairs(
            dedup.build_ngram_index(corpus), sigs, new, **GEOM))
        stored = dedup.incremental_minhash_pairs(
            stored_grams, None, new, index_banded=stored_banded, **GEOM)
        assert _pairs(stored) == inline and len(inline) > 0
        dedup.release_intermediates(stored)

        # plan shape: no Exchange on the corpus (banded-scan) side of
        # the candidate join — broadcast mode
        plan_probe = dedup.incremental_minhash_pairs(
            stored_grams, None, new, index_banded=stored_banded, **GEOM
        )
        plan = plans.formatted_plan(plan_probe)
        dedup.release_intermediates(plan_probe)
        assert "pwp_test_mhidx_banded" in plan
        scan_section = [
            seg for seg in plan.split("Scan parquet") if "pwp_test_mhidx_banded" in seg
        ]
        assert scan_section, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS pwp_test_mhidx_banded")
        spark.sql("DROP TABLE IF EXISTS pwp_test_mhidx_grams")


def test_stored_ngram_index_smj_shuffles_batch_side_only(spark, sf_dir):
    """g-bucketed ngram index + broadcast disabled: the probe join's
    corpus side is Exchange-free (bucketed scan feeds the SMJ); only
    the batch side is re-partitioned."""
    docs, corpus, new = _docs(spark, sf_dir)
    dedup.write_ngram_index(dedup.build_ngram_index(corpus), "pwp_test_ngidx")
    # broadcast_batch=False is what actually forces the SMJ path — the
    # F.broadcast hint is binding and would override a disabled
    # threshold, so the conf alone would silently test nothing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stored = spark.table("pwp_test_ngidx")
        probe = dedup.incremental_jaccard_pairs(
            stored, new, threshold=0.8, broadcast_batch=False
        )
        # isolate the candidate xi join: corpus-side scan of the
        # bucketed table must not sit under an Exchange. Textual check:
        # the executed plan's subtree between the bucketed scan and its
        # SortMergeJoin contains no Exchange line.
        plan_str = probe._jdf.queryExecution().executedPlan().toString()
        lines = plan_str.splitlines()
        scan_idx = [i for i, ln in enumerate(lines) if "pwp_test_ngidx" in ln and "Scan" in ln]
        assert scan_idx, plan_str
        assert "SortMergeJoin" in plan_str, plan_str  # SMJ actually planned
        for i in scan_idx:
            # walk UP from the scan to the nearest join; no Exchange may
            # appear on that path (the scan's own operator chain)
            j = i
            while j > 0 and "Join" not in lines[j]:
                assert "Exchange" not in lines[j], "\n".join(lines[max(0, j-4):i+1])
                j -= 1
        # and the SMJ result matches the broadcast-mode result
        bc = dedup.incremental_jaccard_pairs(stored, new, threshold=0.8)
        assert _pairs(probe) == _pairs(bc)
        dedup.release_intermediates(probe)
        dedup.release_intermediates(bc)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS pwp_test_ngidx")


def test_dedup_operators_release_all_storage(spark, sf_dir):
    """After release_intermediates, NO persisted RDD survives — the
    hygiene contract for long-lived sessions (streaming curator)."""
    docs, corpus, new = _docs(spark, sf_dir)
    jsc = spark.sparkContext._jsc.sc()
    # earlier tests in the session may have left entries; the contract
    # under test is that THESE operators add none that release misses
    spark.catalog.clearCache()

    for make in (
        lambda: dedup.minhash_dedup_pairs(docs, **GEOM),
        lambda: dedup.incremental_jaccard_pairs(
            dedup.build_ngram_index(corpus), new, threshold=0.8, max_shingle_freq=CAP
        ),
    ):
        df = make()
        df.count()  # materialize (persists populate)
        dedup.release_intermediates(df)
        assert jsc.getPersistentRDDs().size() == 0, (
            "persisted RDDs left behind: %d" % jsc.getPersistentRDDs().size()
        )


EMB_GEOM = dict(dim=64, num_planes=8, num_tables=8, threshold=0.4)


def _embs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        emb,
        emb.filter(F.col("vec_id") % 5 != 0),  # indexed corpus
        emb.filter(F.col("vec_id") % 5 == 0),  # new batch
    )


def _epairs(df):
    out = {(r.id_a, r.id_b, round(r.cosine, 9)) for r in df.collect()}
    dedup.release_intermediates(df)
    return out


def test_incremental_embedding_equals_batch(spark, sf_dir):
    """The embedding screen against a prebuilt (vec, sig) index
    returns exactly the batch LSH pipeline's pairs restricted to
    touching-new — bitwise, because the verify arithmetic is shared."""
    emb, corpus, new = _embs(spark, sf_dir)
    batch = _epairs(dedup.embedding_cosine_pairs_lsh(emb, **EMB_GEOM))
    vecs, sigs = dedup.build_embedding_index(
        corpus, dim=64, num_planes=EMB_GEOM["num_planes"],
        num_tables=EMB_GEOM["num_tables"])
    inc = _epairs(dedup.incremental_embedding_pairs(vecs, sigs, new, **EMB_GEOM))
    assert inc == _touching_new(batch) and len(inc) > 0


def test_stored_bucketed_embedding_index_probe(spark, sf_dir):
    """write_embedding_index → probe via the stored bucketed tables:
    identical pairs to the in-memory index, and the candidate join
    consumes the (tbl, bucket)-bucketed sig scan directly."""
    from play_with_pulsar_spark import plans

    emb, corpus, new = _embs(spark, sf_dir)
    vecs, sigs = dedup.build_embedding_index(
        corpus, dim=64, num_planes=EMB_GEOM["num_planes"],
        num_tables=EMB_GEOM["num_tables"])
    mem = _epairs(dedup.incremental_embedding_pairs(vecs, sigs, new, **EMB_GEOM))
    dedup.write_embedding_index(vecs, sigs, "pwp_test_embidx")
    try:
        svecs, ssigs = dedup.read_embedding_index(spark, "pwp_test_embidx")
        stored = dedup.incremental_embedding_pairs(svecs, ssigs, new, **EMB_GEOM)
        assert _epairs(stored) == mem and len(mem) > 0

        plan_probe = dedup.incremental_embedding_pairs(svecs, ssigs, new, **EMB_GEOM)
        plan = plans.formatted_plan(plan_probe)
        dedup.release_intermediates(plan_probe)
        assert "pwp_test_embidx_sig" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS pwp_test_embidx_sig")
        spark.sql("DROP TABLE IF EXISTS pwp_test_embidx_vec")


def test_embedding_bucket_cap_bounds_viral_cluster(spark):
    """60 near-identical vectors split across index and batch must not
    quadratically dominate the embedding screen's candidate join: with
    max_bucket_size set their buckets are dropped while an unrelated
    near-dup pair survives (contract: exact dedup owns such clusters)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base_v = rng.randn(8)
    other = rng.randn(8)
    rows = [
        (i, [float(x) for x in base_v + 0.001 * rng.randn(8)]) for i in range(60)
    ]
    rows += [
        (100, [float(x) for x in other]),
        (201, [float(x) for x in other + 0.001 * rng.randn(8)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    vecs, sigs = dedup.build_embedding_index(corpus, dim=8, num_planes=4,
                                             num_tables=4)
    capped = dedup.incremental_embedding_pairs(
        vecs, sigs, new, dim=8, num_planes=4, num_tables=4,
        threshold=0.95, max_bucket_size=20,
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    dedup.release_intermediates(capped)
    assert not any(a < 60 and b < 60 for a, b in got)  # viral pairs excluded
    # the normal pair (100 in corpus, 201 in batch) is touching-new and
    # must survive the cap — its buckets hold only 2 vectors
    assert (100, 201) in got
    uncapped = dedup.incremental_embedding_pairs(
        vecs, sigs, new, dim=8, num_planes=4, num_tables=4, threshold=0.95,
    )
    all_pairs = {(r.id_a, r.id_b) for r in uncapped.collect()}
    dedup.release_intermediates(uncapped)
    assert sum(1 for a, b in all_pairs if a < 60 and b < 60) > 100
    assert got < all_pairs


def test_zero_norm_vectors_never_near_duplicates(spark):
    """Round-6 advice fix: a zero-norm vector lands in bucket 0 of
    every hyperplane table (all sign bits false) but has no defined
    cosine — 0/0 must become NULL (dropped), never NaN (which Spark
    sorts ABOVE every threshold). Both the batch LSH pipeline and the
    incremental screen must exclude such vectors from all pairs."""
    import numpy as np

    rng = np.random.RandomState(11)
    v = rng.randn(8)
    rows = [
        (0, [0.0] * 8),                       # zero-norm, corpus side
        (2, [float(x) for x in v]),           # corpus
        (3, [float(x) for x in v * 1.001]),   # batch: near-dup of 2
        (5, [0.0] * 8),                       # zero-norm, batch side
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    batch_pairs = dedup.embedding_cosine_pairs_lsh(
        emb, dim=8, num_planes=2, num_tables=4, threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in batch_pairs.collect()}
    dedup.release_intermediates(batch_pairs)
    assert got == {(2, 3)}, got  # the zero vectors collide but never emit

    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    vecs, sigs = dedup.build_embedding_index(corpus, dim=8, num_planes=2,
                                             num_tables=4)
    inc = dedup.incremental_embedding_pairs(
        vecs, sigs, new, dim=8, num_planes=2, num_tables=4, threshold=0.5
    )
    got_inc = {(r.id_a, r.id_b) for r in inc.collect()}
    dedup.release_intermediates(inc)
    assert got_inc == {(2, 3)}, got_inc


def test_embedding_screen_string_ids(spark):
    """Round-6 advice fix: hyperplane signatures carry the INPUT id
    type (the curator's embedding screen promises string crawl ids);
    the whole incremental screen must run end-to-end on string ids."""
    import numpy as np

    rng = np.random.RandomState(13)
    v = rng.randn(8)
    rows = [
        ("crawl/a", [float(x) for x in v]),
        ("crawl/b", [float(x) for x in rng.randn(8)]),
        ("crawl/c", [float(x) for x in v * 1.002]),  # near-dup of a
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    sigs_multi = similarity.hyperplane_signatures_multi(emb, dim=8, num_planes=2,
                                                        num_tables=4)
    assert sigs_multi.schema["vec_id"].dataType.simpleString() == "string"

    corpus = emb.filter(F.col("vec_id") != "crawl/c")
    new = emb.filter(F.col("vec_id") == "crawl/c")
    vecs, sigs = dedup.build_embedding_index(corpus, dim=8, num_planes=2,
                                             num_tables=4)
    inc = dedup.incremental_embedding_pairs(
        vecs, sigs, new, dim=8, num_planes=2, num_tables=4, threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in inc.collect()}
    dedup.release_intermediates(inc)
    assert got == {("crawl/a", "crawl/c")}, got


def test_verify_without_broadcast_hints_same_result(spark, sf_dir):
    """Round-7 advice fix: broadcast_candidates=False removes the
    verify stage's BINDING broadcast hints (the escape hatch for
    uncapped runs whose candidate set may be huge) without changing a
    single pair — and the unhinted plan really does lose its
    BroadcastHashJoins in favor of the planner's shuffle fallback."""
    docs, _, _ = _docs(spark, sf_dir)
    hinted = dedup.minhash_dedup_pairs(docs, **GEOM)
    unhinted = dedup.minhash_dedup_pairs(docs, **GEOM, broadcast_candidates=False)
    assert _pairs(hinted) == _pairs(unhinted) != set()
    # the batch path threads the same flag through broadcast_batch
    docs2, corpus, new = _docs(spark, sf_dir)
    grams, sigs = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    a = _pairs(dedup.incremental_minhash_pairs(grams, sigs, new, **GEOM))
    grams2, sigs2 = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    b = _pairs(
        dedup.incremental_minhash_pairs(
            grams2, sigs2, new, **GEOM, broadcast_batch=False
        )
    )
    assert a == b


def test_incremental_minhash_onepass_mode_equals_all_paths(spark, sf_dir):
    """Round-7: the one-pass inline-build mode (index_sigs=None,
    index_banded=None — index and batch grams signed in ONE kernel
    pass with the is_new flag threaded through) returns exactly the
    explicit-sigs result, the batch-restricted result, and the same
    under a bucket cap. Signatures are per-doc deterministic in
    (seed, shingles), so fusing the passes must change nothing."""
    docs, corpus, new = _docs(spark, sf_dir)
    g1, s1 = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    explicit = _pairs(dedup.incremental_minhash_pairs(g1, s1, new, **GEOM))
    g2 = dedup.build_ngram_index(corpus).persist()
    onepass = _pairs(dedup.incremental_minhash_pairs(g2, None, new, **GEOM))
    batch = _pairs(dedup.minhash_dedup_pairs(docs, **GEOM))
    assert onepass == explicit == _touching_new(batch) != set()

    g3, s3 = dedup.build_minhash_index(corpus, num_hashes=GEOM["num_hashes"])
    cap_explicit = _pairs(
        dedup.incremental_minhash_pairs(g3, s3, new, **GEOM, max_bucket_size=20)
    )
    g4 = dedup.build_ngram_index(corpus).persist()
    cap_onepass = _pairs(
        dedup.incremental_minhash_pairs(g4, None, new, **GEOM, max_bucket_size=20)
    )
    assert cap_onepass == cap_explicit


def test_incremental_jaccard_maintained_df_index(spark, sf_dir):
    """Round-7: the maintained (g, df) aggregate replaces the per-batch
    corpus recount in the stop-shingle cap with IDENTICAL results —
    and the aggregate is additive across disjoint batches, so
    merge_df_index maintains it exactly (df_index(a ∪ b) ==
    merge(df_index(a), df_index(b)))."""
    docs, corpus, new = _docs(spark, sf_dir)
    index = dedup.build_ngram_index(corpus).persist()
    recount = _pairs(
        dedup.incremental_jaccard_pairs(
            index, new, threshold=0.8, max_shingle_freq=CAP
        )
    )
    dfi = dedup.build_df_index(index).persist()
    maintained = _pairs(
        dedup.incremental_jaccard_pairs(
            index, new, threshold=0.8, max_shingle_freq=CAP, index_df=dfi
        )
    )
    assert maintained == recount != set()

    # additivity law: build over halves, merge, compare to one-shot
    half_a = dedup.build_ngram_index(corpus.filter(F.col("doc_id") % 2 == 0))
    half_b = dedup.build_ngram_index(corpus.filter(F.col("doc_id") % 2 == 1))
    merged = {
        (r.g, r.df)
        for r in dedup.merge_df_index(
            dedup.build_df_index(half_a), dedup.build_df_index(half_b)
        ).collect()
    }
    oneshot = {(r.g, r.df) for r in dfi.collect()}
    assert merged == oneshot
    dfi.unpersist()
    index.unpersist()

    # and a MERGED maintained index drives the same screen decisions
    dfm = dedup.merge_df_index(
        dedup.build_df_index(half_a), dedup.build_df_index(half_b)
    )
    index2 = dedup.build_ngram_index(corpus).persist()
    maintained2 = _pairs(
        dedup.incremental_jaccard_pairs(
            index2, new, threshold=0.8, max_shingle_freq=CAP, index_df=dfm
        )
    )
    assert maintained2 == recount
    index2.unpersist()
