"""Count-min sketch laws: merge additivity, one-sided error,
collision-free exactness at wide geometry, and the heavy-hitter cut.

The declared query (``sketch_cms_heavy_hitters``) is hash-checked
against its DuckDB oracle by test_oracle_parity; these tests pin the
OPERATOR laws the oracle can't state — the properties that make the
sketch maintainable and safe as a screen at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import sketch, textops

GEOM = dict(depth=4, width=256)


def _items(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", F.explode(textops.tokens(F.col("text"))).alias("tok")
    )


def _cells(df):
    return {(r.row, r.bucket): r.cnt for r in df.collect()}


def test_cms_merge_equals_oneshot(spark, sf_dir):
    """Additivity: sketch(a ∪ b) == cellwise-sum(sketch(a), sketch(b))
    for disjoint halves — the incremental-maintenance law (same role
    as the curator df tier's merge law, but fixed-width)."""
    items = _items(spark, sf_dir).persist()
    whole = _cells(sketch.cms_build(items, **GEOM))
    half_a = sketch.cms_build(items.filter(F.col("doc_id") % 2 == 0), **GEOM)
    half_b = sketch.cms_build(items.filter(F.col("doc_id") % 2 == 1), **GEOM)
    merged = _cells(sketch.cms_merge(half_a, half_b))
    assert merged == whole != {}
    items.unpersist()


def test_cms_estimate_never_undercounts(spark, sf_dir):
    """One-sided error: est >= true count for EVERY token — the
    property that keeps frequency-cap screens conservative under the
    sketch. The fixture vocabulary is ~31 tokens, so the geometry must
    be TINY (4x8) for min-over-rows to actually collide — checked
    non-vacuous below."""
    items = _items(spark, sf_dir).persist()
    tight = dict(depth=4, width=8)
    sk = sketch.cms_build(items, **tight)
    truth = items.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketch.cms_estimate(sk, truth, key="tok", **tight)
    bad = est.filter(F.col("est") < F.col("true_cnt")).count()
    over = est.filter(F.col("est") > F.col("true_cnt")).count()
    assert bad == 0
    # the tight geometry vs the vocabulary MUST collide somewhere,
    # or the test is vacuous
    assert over > 0
    items.unpersist()


def test_cms_exact_when_width_exceeds_vocab(spark, sf_dir):
    """With width >> vocabulary no row need collide, and min-over-rows
    recovers the exact count for every token (any row without a
    collision suffices, and 4 rows at 1<<17 cells over the fixture's
    ~31-token vocab give one with overwhelming margin —
    deterministically checked, not assumed)."""
    items = _items(spark, sf_dir).persist()
    geom = dict(depth=4, width=1 << 17)
    sk = sketch.cms_build(items, **geom)
    truth = items.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = sketch.cms_estimate(sk, truth, key="tok", **geom)
    assert est.filter(F.col("est") != F.col("true_cnt")).count() == 0
    items.unpersist()


def test_cms_weighted_equals_repeated_rows(spark):
    """weight= col increments by the weight: a (key, w) frame sketches
    identically to the same keys physically repeated w times."""
    rows = [("a", 3), ("b", 1), ("c", 5)]
    weighted = spark.createDataFrame(rows, "tok string, w int")
    repeated = spark.createDataFrame(
        [(t,) for t, w in rows for _ in range(w)], "tok string"
    )
    a = _cells(sketch.cms_build(weighted, weight="w", **GEOM))
    b = _cells(sketch.cms_build(repeated, **GEOM))
    assert a == b != {}


def test_cms_heavy_hitters_finds_planted_heavy_key(spark, sf_dir):
    """A token planted with more occurrences than any real token must
    rank first; rn is 1..k dense; every estimate >= the planted
    token's true count ordering is preserved at the top."""
    items = _items(spark, sf_dir).select("tok")
    n = items.count()
    planted = spark.range(n + 1).select(F.lit("zzz_planted").alias("tok"))
    hh = sketch.cms_heavy_hitters(
        items.unionByName(planted), key="tok", k=10, **GEOM
    ).collect()
    assert [r.rn for r in hh] == list(range(1, 11))
    assert hh[0].tok == "zzz_planted"
    assert hh[0].est >= n + 1


def test_cms_stop_keys_superset_of_exact(spark, sf_dir):
    """The CMS-driven frequency cap flags a SUPERSET of the exact
    df > cap stop-set (one-sided error makes the screen conservative)
    — and at a collision-prone geometry the superset is strict, so
    the law is tested non-vacuously."""
    items = _items(spark, sf_dir).persist()
    tight = dict(depth=4, width=8)
    cap = 500
    sk = sketch.cms_build(items, **tight)
    probes = items.select("tok").distinct()
    flagged = {r.tok for r in sketch.cms_stop_keys(sk, probes, cap, **tight).collect()}
    exact = {
        r.tok
        for r in items.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cap)
        .collect()
    }
    assert exact <= flagged
    assert exact != set()
    assert flagged != exact  # collisions over-flag at 4x8: strictness
    items.unpersist()
