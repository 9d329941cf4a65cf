"""Quality-classifier operator (round 6): distributed logistic
regression for corpus filtering, plus the LSH auto-geometry sizing
rule the round-6 scale probe motivated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import classifier, dedup, similarity
from play_with_pulsar_spark.queries import REGISTRY


def test_logreg_recovers_separable_rule(spark):
    """On linearly separable features the GD fit must recover the
    rule exactly (train accuracy 1.0): docs with many tokens vs few —
    separated by the log_tokens feature after z-scoring."""
    rows = [(i, "word " * (200 if i % 2 else 5), i % 2) for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    feats = classifier.standardize(
        classifier.quality_features(docs, label=F.col("y") == 1)
    ).cache()
    w = classifier.logreg_fit(feats, iters=10, lr=2.0)
    scored = classifier.logreg_score(feats, w)
    wrong = scored.filter(
        ((F.col("score") >= 0.5) & (F.col("y") == 0.0))
        | ((F.col("score") < 0.5) & (F.col("y") == 1.0))
    ).count()
    assert wrong == 0
    # determinism protocol: weights live on the 1e-9 grid
    assert all(abs(x - round(x, 9)) < 1e-15 for x in w)
    feats.unpersist()


def test_fit_on_seed_scores_batch(spark, sf_dir, tmp_path):
    """The crawl-loop usage: fit on a labeled seed subset, persist
    (weights + TRAINING standardization stats), reload in a later
    session, and score an unlabeled batch — the batch is z-scored
    with the SEED's stats (its own stats would shift the boundary
    with the batch mix), scoring is a pure projection, and no label
    column is needed on the batch."""
    from play_with_pulsar_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    raw_seed = classifier.quality_features(seed, label=F.length("text") >= 400)
    stats = classifier.feature_stats(raw_seed)
    seed_f = classifier.standardize(raw_seed, stats).cache()
    w = classifier.logreg_fit(seed_f, iters=10, lr=2.0)
    seed_f.unpersist()
    model_path = str(tmp_path / "quality_model.json")
    classifier.save_model(model_path, w, stats)
    w2, stats2 = classifier.load_model(model_path)
    assert w2 == w and stats2 == stats
    batch_scored = classifier.logreg_score(
        classifier.standardize(classifier.quality_features(batch), stats2), w2
    )
    got = batch_scored.select("doc_id", "score").collect()
    assert len(got) == batch.count()
    assert all(0.0 <= r.score <= 1.0 for r in got)
    # the learned filter transfers: it agrees with the teacher rule on
    # most of the unseen batch
    agree = (
        batch_scored.join(batch.select("doc_id", F.length("text").alias("n")), "doc_id")
        .filter(((F.col("score") >= 0.5) & (F.col("n") >= 400))
                | ((F.col("score") < 0.5) & (F.col("n") < 400)))
        .count()
    )
    assert agree / len(got) >= 0.85, agree / len(got)


def test_classifier_plan_shapes(spark, sf_dir):
    """Scale contract: features/z-scores/scoring are pure projections
    (zero exchanges); each fit iteration's aggregate partial-aggregates
    map-side."""
    from play_with_pulsar_spark import plans
    from play_with_pulsar_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = classifier.quality_features(docs, label=F.length("text") >= 400)
    assert plans.count_shuffles(feats) == 0
    z = classifier.standardize(feats)
    assert plans.count_shuffles(z) == 0
    scored = classifier.logreg_score(z, [0.1] * 6)
    assert plans.count_shuffles(scored) == 0
    assert "InPandas" not in plans.formatted_plan(scored)
    # the gradient aggregate (what logreg_fit runs per iteration)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-classifier._margin([0.0] * 6)))
    g = z.agg(F.round(F.avg(p - F.col("y")), 9).alias("g0"))
    assert plans.has_partial_aggregation(g)
    assert plans.count_shuffles(g) <= 1


def test_declared_query_learns(spark, sf_dir):
    """The registered query reaches high agreement with its teacher
    rule — guards against the unnormalized-GD regression (accuracy
    stuck at majority class) ever coming back."""
    df = REGISTRY["quality_classifier_scores"].fn(spark, sf_dir).cache()
    n = df.count()
    agree = df.filter(F.col("keep") == (F.col("label") == 1)).count()
    assert agree / n >= 0.9, f"agreement {agree}/{n}"
    # both classes present in the output
    assert df.filter(F.col("keep")).count() > 0
    assert df.filter(~F.col("keep")).count() > 0
    dedup.release_intermediates(df)
    df.unpersist()


@pytest.mark.parametrize("n,threshold", [(2_000, 0.9), (2_000_000, 0.9)])
def test_lsh_auto_geometry_recall_math(n, threshold):
    """Sizing rule invariants: planes track log2(N), and the table
    count restores the target recall at the threshold similarity."""
    import math

    planes, tables = similarity.lsh_auto_geometry(n, threshold=threshold)
    assert planes >= math.log2(n / 8) - 1
    p_plane = 1.0 - math.acos(threshold) / math.pi
    recall = 1.0 - (1.0 - p_plane**planes) ** tables
    assert recall >= 0.89, (planes, tables, recall)


def test_lsh_auto_geometry_bucket_occupancy_bounded():
    """The superlinearity root cause (round-6 probe: fixed planes →
    38x cost at 10x data): expected bucket occupancy N/2^planes must
    stay O(target) as N grows."""
    for n in (2_000, 20_000, 200_000, 2_000_000):
        planes, _ = similarity.lsh_auto_geometry(n, threshold=0.9,
                                                 target_bucket_size=8)
        if planes < 24:  # below the clamp
            assert n / 2**planes <= 16, (n, planes)


def test_auto_geometry_keeps_recall_on_clustered_vectors(spark):
    """End-to-end: auto-sized geometry on a planted near-dup corpus
    finds ≥90% of the exact pairs (the guarantee the formula claims),
    while fixed small-plane geometry at this size would."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(150):
        base = rng.randn(32)
        rows.append((2 * i, [float(x) for x in base]))
        rows.append((2 * i + 1, [float(x) for x in base + 0.05 * rng.randn(32)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs_exact(df, threshold=0.9).collect()
    }
    planes, tables = similarity.lsh_auto_geometry(len(rows), threshold=0.9)
    got_df = dedup.embedding_cosine_pairs_lsh(
        df, dim=32, threshold=0.9, num_planes=planes, num_tables=tables
    )
    got = {(r.id_a, r.id_b) for r in got_df.collect()}
    dedup.release_intermediates(got_df)
    assert got <= exact  # exact verify: no false positives
    assert len(got) / max(len(exact), 1) >= 0.9, (len(got), len(exact))


def test_streaming_scoring_matches_batch(spark, sf_dir, tmp_path):
    """The crawl-loop's streaming half: a persisted model scores a
    document STREAM (stateless projection — featurize + z-score with
    training stats + literal-weight sigmoid all run per micro-batch
    with no state), and the streamed scores equal the batch scores
    exactly."""
    from play_with_pulsar_spark.sources.tables import load_table
    from play_with_pulsar_spark.streaming import pipeline as sp

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = classifier.quality_features(docs, label=F.length("text") >= 400)
    stats = classifier.feature_stats(raw)
    w = classifier.logreg_fit(classifier.standardize(raw, stats), iters=5, lr=2.0)

    in_dir = tmp_path / "docs_stream"
    docs.limit(200).repartition(4).write.mode("overwrite").parquet(str(in_dir))
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(str(in_dir))
    )
    scored_stream = classifier.logreg_score(
        classifier.standardize(classifier.quality_features(stream), stats), w
    ).select("doc_id", "score")
    out = sp.run_to_completion(scored_stream, "clf_stream", "append")
    got = {(r.doc_id, r.score) for r in out.collect()}
    want = {
        (r.doc_id, r.score)
        for r in classifier.logreg_score(
            classifier.standardize(
                classifier.quality_features(docs.limit(200)), stats
            ),
            w,
        ).select("doc_id", "score").collect()
    }
    assert got == want and len(got) == 200


def test_feature_stats_degenerate_frames(spark):
    """Round-7 advice fix: an EMPTY training frame raises a clear
    ValueError (means are NULL — nothing to fit) instead of an opaque
    float(None) TypeError, and a 1-row frame (stddev_samp NULL) falls
    back to unit variance instead of crashing."""
    empty = classifier.quality_features(
        spark.createDataFrame([], "doc_id long, text string"),
        label=F.lit(True),
    )
    with pytest.raises(ValueError, match="empty training frame"):
        classifier.feature_stats(empty)

    one = classifier.quality_features(
        spark.createDataFrame([(1, "a few plain words here")],
                              "doc_id long, text string"),
        label=F.lit(True),
    )
    stats = classifier.feature_stats(one)
    assert all(sd == 1.0 for _, sd in stats.values())
    # and the z-scores that standardization derives are all finite 0s
    z = classifier.standardize(one, stats=stats)
    row = z.select(*classifier.FEATURES).collect()[0]
    assert all(v == 0.0 for v in row)
