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


# ---------------------------------------------------------------------------
# HyperLogLog laws


def _regs(df):
    return {tuple(r) for r in df.collect()}


def _keys(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("tok")
    )


def test_hll_merge_equals_oneshot_even_overlapping(spark):
    """Register-max merge is exact under ANY re-batching — including
    OVERLAPPING batches and replays (max is idempotent), which is
    strictly stronger than the CMS sum law (exact only for disjoint
    streams). This is what makes per-shard HLL maintenance replay-safe
    without the curator's idempotence machinery."""
    items = _keys(spark, 2000).persist()
    whole = _regs(sketch.hll_build(items, m=64))
    a = sketch.hll_build(items.filter(F.col("tok") < "k5"), m=64)  # overlaps b
    b = sketch.hll_build(items, m=64)  # the whole stream again (replay)
    assert _regs(sketch.hll_merge(a, b)) == whole != set()
    # disjoint split too
    c = sketch.hll_build(items.filter(F.length("tok") % 2 == 0), m=64)
    d = sketch.hll_build(items.filter(F.length("tok") % 2 == 1), m=64)
    assert _regs(sketch.hll_merge(c, d)) == whole
    items.unpersist()


def test_hll_duplicates_are_free(spark):
    """The register is a max, so duplicate keys change NOTHING — the
    defining distinct-counter property (a frequency sketch would
    drift; the HLL registers are bit-identical)."""
    distinct = _keys(spark, 500)
    repeated = distinct.crossJoin(spark.range(5).select(F.lit(1).alias("_x"))).select(
        "tok"
    )
    assert _regs(sketch.hll_build(repeated, m=64)) == _regs(
        sketch.hll_build(distinct, m=64)
    )


def test_hll_estimate_within_error_bound(spark):
    """Relative error within 4 standard errors (1.04/sqrt(m)) of the
    true cardinality on the raw-estimate branch, across independent
    salts (each salt is a fresh hash draw). Also pins the specific
    cross-checked value: the pure-python/DuckDB/Spark triple agreed on
    this draw bit-for-bit during design (see queries.py oracle)."""
    true = 10_000
    items = _keys(spark, true).persist()
    bound = 4 * 1.04 / (64**0.5)
    for salt in ("", "s1", "s2"):
        est = sketch.hll_distinct(items, m=64, salt=salt).collect()[0].est
        assert abs(est / true - 1) < bound, (salt, est)
    items.unpersist()


def test_hll_small_range_linear_counting(spark):
    """Tiny cardinalities take the linear-counting branch (est <=
    2.5m with empty registers), which is near-exact there: 5 distinct
    keys at m=64 estimate to 64*ln(64/59) ~ 5.2. The branch constants
    are literal-table doubles, so this is deterministic."""
    est = sketch.hll_distinct(_keys(spark, 5), m=64).collect()[0].est
    assert 4.0 <= est <= 7.0
    one = sketch.hll_distinct(_keys(spark, 1), m=64).collect()[0].est
    assert 0.5 <= one <= 1.5


def test_hll_empty_and_geometry_validation(spark):
    """Empty sketch estimates 0; m outside [16, 1024] or non-power-
    of-two raises (the literal correction table is sized m-1)."""
    empty = spark.createDataFrame([], "bucket long, mreg int")
    assert sketch.hll_estimate(empty, m=64).collect()[0].est == 0.0
    import pytest

    for bad in (8, 48, 2048):
        with pytest.raises(ValueError, match="power of two"):
            sketch.hll_build(_keys(spark, 1), m=bad)


def test_hll_grouped_registers_are_per_group(spark):
    """Per-group sketches are independent: each group's registers
    equal the single-group sketch of that group's rows alone."""
    items = _keys(spark, 300).withColumn(
        "grp", (F.length("tok") % 2).cast("int")
    ).persist()
    grouped = sketch.hll_build(items, m=64, group_cols=["grp"])
    for g in (0, 1):
        alone = _regs(sketch.hll_build(items.filter(F.col("grp") == g), m=64))
        sub = _regs(grouped.filter(F.col("grp") == g).drop("grp"))
        assert sub == alone != set()
    items.unpersist()


# ---------------------------------------------------------------------------
# Bloom filter laws

BGEOM = dict(m_bits=4096, k=3)


def test_hll_set_algebra_laws(spark):
    """Inclusion-exclusion set algebra (round 7): (a) A vs A —
    identical sketches give intersect == est and jaccard == 1 exactly
    (union by register-max is idempotent); (b) disjoint planted sets —
    estimated Jaccard stays near 0 (within compounded sketch error);
    (c) planted 50% overlap — intersection estimate within 4 compound
    standard errors of truth, and est_union equals the one-shot
    estimate of the true union (the merge law surfaced through the
    algebra)."""
    a = _keys(spark, 4000).persist()  # keys 0..3999
    b = (
        spark.range(2000, 6000)
        .select(F.concat(F.lit("k"), F.col("id")).alias("tok"))
        .persist()
    )
    sk_a = sketch.hll_build(a, m=64)
    sk_b = sketch.hll_build(b, m=64)

    same = sketch.hll_set_algebra(sk_a, sk_a, m=64).collect()[0]
    assert same.est_a == same.est_union
    assert abs(same.est_intersect - round(same.est_a, 6)) < 1e-6
    assert same.est_jaccard == 1.0

    half = sketch.hll_set_algebra(sk_a, sk_b, m=64).collect()[0]
    # union estimate == one-shot estimate of the true union
    union_oneshot = sketch.hll_distinct(a.unionByName(b).distinct(), m=64).collect()[0].est
    assert abs(half.est_union - union_oneshot) < 1e-9
    # intersection truth 2000; each term carries ~13% stderr at m=64,
    # the difference compounds ~3x of one term on the 6000-wide union
    tol = 4 * 3 * (1.04 / 8) * 6000
    assert abs(half.est_intersect - 2000) < tol

    c = spark.range(10_000, 14_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("tok")
    )
    disj = sketch.hll_set_algebra(sk_a, sketch.hll_build(c, m=64), m=64).collect()[0]
    assert disj.est_jaccard < 0.45  # truth 0, compounded-error head-room
    a.unpersist(), b.unpersist()


def test_bloom_no_false_negatives(spark):
    """EVERY member of the build set tests true — the one-sided
    guarantee that makes a Bloom-driven decontamination screen
    conservative (contamination never slips through)."""
    members = _keys(spark, 300, "m")
    bl = sketch.bloom_build(members, key="tok", **BGEOM)
    tested = sketch.bloom_contains(bl, members, key="tok", **BGEOM)
    assert tested.filter(~F.col("maybe_member")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members flag at ~(1 - e^(-k*n/m))^k — 0.77% at n=300,
    m=4096, k=3. Assert under 4x theory (the md5 draw is fixed, so
    this is deterministic, not flaky) and NON-ZERO at this tight
    geometry so the superset laws elsewhere are tested against real
    collisions."""
    members = _keys(spark, 300, "m")
    others = _keys(spark, 3000, "x")
    bl = sketch.bloom_build(members, key="tok", **BGEOM)
    fp = (
        sketch.bloom_contains(bl, others, key="tok", **BGEOM)
        .filter(F.col("maybe_member"))
        .count()
    )
    assert 0 < fp / 3000 < 0.03


def test_bloom_merge_equals_oneshot_even_overlapping(spark):
    """OR-merge (union-distinct of positions) is idempotent like the
    HLL max: overlapping batches and replays fold to exactly the
    one-shot filter."""
    items = _keys(spark, 400, "m").persist()
    whole = {r.pos for r in sketch.bloom_build(items, key="tok", **BGEOM).collect()}
    a = sketch.bloom_build(items.filter(F.col("tok") < "m2"), key="tok", **BGEOM)
    b = sketch.bloom_build(items, key="tok", **BGEOM)  # replay
    merged = {r.pos for r in sketch.bloom_merge(a, b).collect()}
    assert merged == whole != set()
    items.unpersist()


def test_bloom_contains_is_broadcast_only(spark):
    """The probe side of bloom_contains must not shuffle: all k
    membership joins are BroadcastHashJoins (the filter side is
    bounded at m_bits rows), never SortMergeJoin — the property that
    lets the screen run inside the corpus scan stage at 100 TB."""
    members = _keys(spark, 300, "m")
    bl = sketch.bloom_build(members, key="tok", **BGEOM)
    tested = sketch.bloom_contains(bl, _keys(spark, 1000, "x"), key="tok", **BGEOM)
    plan = tested._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == BGEOM["k"]


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


# ---------------------------------------------------------------------------
# HDR histogram (quantiles)


def test_hdr_bucketing_exact_region_and_level_bounds(spark):
    """Values below 2^sub_bits get unit-resolution buckets (idx == v);
    coarser values round down to a bucket lower bound within a
    2^-sub_bits relative factor; zero maps to bucket 0."""
    rows = [(v,) for v in [0, 1, 7, 31, 32, 33, 63, 64, 100, 1000, 12345]]
    df = spark.createDataFrame(rows, "v long")
    sk = sketch.hdr_build(df, "v", sub_bits=5)
    lbs = {
        r.q: r.est
        for r in sketch.hdr_quantiles(sk, [0.000001], sub_bits=5).collect()
    }
    assert lbs[0.000001] == 0  # min bucket lower bound
    idxs = {r.idx for r in sk.collect()}
    assert {0, 1, 7, 31, 32, 33} <= idxs  # exact region: idx == v
    # every value's bucket lower bound satisfies lb <= v < lb*(1+2^-5)+1
    from play_with_pulsar_spark.operators.sketch import _hdr_lb

    pairs = (
        df.select("v", sketch._hdr_idx(F.col("v"), 5))
        .select("v", _hdr_lb(F.col("idx"), 5).alias("lb"))
        .collect()
    )
    for r in pairs:
        assert r.lb <= r.v < max(r.lb * (1 + 2 ** -5) + 1, r.lb + 1)


def test_hdr_merge_equals_oneshot_and_weighted(spark):
    """Additive merge of disjoint batches == one-shot sketch of the
    union; weight=w == w repeated rows."""
    import random

    rng = random.Random(7)
    vals = [rng.randrange(0, 100_000) for _ in range(2000)]
    a = spark.createDataFrame([(v,) for v in vals[:900]], "v long")
    b = spark.createDataFrame([(v,) for v in vals[900:]], "v long")
    u = spark.createDataFrame([(v,) for v in vals], "v long")
    merged = sketch.hdr_merge(
        sketch.hdr_build(a, "v"), sketch.hdr_build(b, "v")
    )
    one = sketch.hdr_build(u, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, one.collect()))
    w = spark.createDataFrame([(5, 3), (9, 1)], "v long, w long")
    rep = spark.createDataFrame([(5,), (5,), (5,), (9,)], "v long")
    assert sorted(map(tuple, sketch.hdr_build(w, "v", weight="w").collect())) == (
        sorted(map(tuple, sketch.hdr_build(rep, "v").collect()))
    )


def test_hdr_quantiles_relative_error_law(spark):
    """For every q, est <= exact lower quantile < est * (1+2^-s) + 1
    — the HDR guarantee, on skewed random data, grouped."""
    import random

    rng = random.Random(11)
    rows = []
    for g in ("a", "b"):
        scale = 50 if g == "a" else 40_000
        rows += [(g, int(rng.expovariate(1.0) * scale)) for _ in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    s = 5
    sk = sketch.hdr_build(df, "v", group_cols=["g"], sub_bits=s)
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    est = {
        (r.g, r.q): r.est
        for r in sketch.hdr_quantiles(sk, qs, group_cols=["g"], sub_bits=s).collect()
    }
    by_g = {"a": sorted(v for g, v in rows if g == "a"),
            "b": sorted(v for g, v in rows if g == "b")}
    import math

    for (g, q), e in est.items():
        exact = by_g[g][math.ceil(q * len(by_g[g])) - 1]
        assert e <= exact < max(e * (1 + 2 ** -s) + 1, e + 1), (g, q, e, exact)
    assert len(est) == 10


def test_hdr_width_bound_and_domain_guard(spark):
    """Sketch width stays under (53 - s) * 2^s + 2^s whatever the
    data; negatives raise the domain error."""
    import random

    rng = random.Random(3)
    big = spark.createDataFrame(
        [(rng.randrange(0, 1 << 52),) for _ in range(5000)], "v long"
    )
    s = 4
    n = sketch.hdr_build(big, "v", sub_bits=s).count()
    assert n <= (53 - s) * (1 << s) + (1 << s)
    import pytest as _pt

    bad = spark.createDataFrame([(-1,)], "v long")
    with _pt.raises(Exception, match="integer domain"):
        sketch.hdr_build(bad, "v").collect()


def test_hdr_exact_when_sub_bits_cover_range(spark):
    """With all values < 2^s the sketch is lossless: every quantile
    equals the exact discrete lower quantile."""
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = sketch.hdr_build(df, "v", sub_bits=5)
    qs = [0.25, 0.5, 0.75, 1.0]
    import math

    got = {r.q: r.est for r in sketch.hdr_quantiles(sk, qs, sub_bits=5).collect()}
    sv = sorted(vals)
    for q in qs:
        assert got[q] == sv[math.ceil(q * len(sv)) - 1]


def test_hdr_distance_laws(spark):
    """TV distance on HDR buckets (round 7): identity (d(P,P)=0),
    disjoint supports (d=1), symmetry, and a planted shift registering
    strictly between."""
    import pyspark.sql.functions as SF

    a = spark.range(1000).select((SF.col("id") % 50 + 10).alias("v"))
    b = spark.range(1000).select((SF.col("id") % 50 + 100_000).alias("v"))
    c = spark.range(1000).select((SF.col("id") % 80 + 10).alias("v"))
    sa = sketch.hdr_build(a, "v", sub_bits=6)
    sb = sketch.hdr_build(b, "v", sub_bits=6)
    sc_ = sketch.hdr_build(c, "v", sub_bits=6)
    same = sketch.hdr_distance(sa, sa).collect()[0]
    assert same.tv == 0.0 and same.n_a == same.n_b == 1000
    disj = sketch.hdr_distance(sa, sb).collect()[0]
    assert disj.tv == 1.0
    ab = sketch.hdr_distance(sa, sc_).collect()[0].tv
    ba = sketch.hdr_distance(sc_, sa).collect()[0].tv
    assert ab == ba and 0.0 < ab < 1.0


def test_hdr_distance_lower_bounds_exact_tv(spark):
    """The docstring's conservativeness claim, pinned: TV at bucket
    resolution NEVER exceeds the exact-value TV (coarsening can only
    merge opposing mass), across several shifted/scaled pairs — so a
    drift alarm thresholded on the sketch never fires above the true
    drift."""
    import pyspark.sql.functions as SF

    def exact_tv(a_vals, b_vals):
        from collections import Counter

        ca, cb = Counter(a_vals), Counter(b_vals)
        na, nb = sum(ca.values()), sum(cb.values())
        keys = set(ca) | set(cb)
        return 0.5 * sum(abs(ca[k] / na - cb[k] / nb) for k in keys)

    cases = [
        (lambda i: i % 97 + 5, lambda i: i % 97 + 25),       # shift
        (lambda i: i % 50 + 1, lambda i: (i % 50 + 1) * 3),  # scale
        (lambda i: i % 200 + 1, lambda i: i % 40 + 1),       # support shrink
    ]
    for fa, fb in cases:
        av = [fa(i) for i in range(2000)]
        bv = [fb(i) for i in range(2000)]
        sa = sketch.hdr_build(
            spark.createDataFrame([(v,) for v in av], "v long"), "v", sub_bits=5
        )
        sb = sketch.hdr_build(
            spark.createDataFrame([(v,) for v in bv], "v long"), "v", sub_bits=5
        )
        tv_sk = sketch.hdr_distance(sa, sb).collect()[0].tv
        tv_ex = exact_tv(av, bv)
        assert tv_sk <= tv_ex + 1e-6, (tv_sk, tv_ex)


# ------------------------------------------------ exact top-k candidates
def test_topk_exact_candidates_planted_heavy_hitters(spark):
    rows = (
        [("hot1",)] * 100 + [("hot2",)] * 50 + [(f"tail{i}",) for i in range(300)]
    )
    items = spark.createDataFrame(rows, "g string")
    got = sketch.topk_exact_candidates(items, key="g", k=2, capacity=512).collect()
    assert [(r.g, r.cnt, r.rn) for r in got] == [("hot1", 100, 1), ("hot2", 50, 2)]


def test_topk_exact_candidates_tie_break_and_exactness(spark):
    # 50 keys x10 each: all tied — rn is deterministic (key asc)
    items = spark.createDataFrame(
        [(f"k{i % 50:02d}",) for i in range(500)], "g string"
    )
    got = sketch.topk_exact_candidates(items, key="g", k=5, capacity=64).collect()
    assert [(r.g, r.cnt) for r in got] == [(f"k{i:02d}", 10) for i in range(5)]


def test_topk_exact_candidates_raises_when_unprovable(spark):
    import pytest as _pt

    # all-distinct keys with capacity 1: every partition evicts, the
    # summed miss bound >= the k-th count (1) — must refuse, never
    # return a silent approximation
    items = spark.createDataFrame([(f"u{i}",) for i in range(500)], "g string")
    with _pt.raises(ValueError, match="miss bound"):
        sketch.topk_exact_candidates(items, key="g", k=5, capacity=1)


def test_topk_exact_candidates_null_keys_excluded(spark):
    """ADVICE r10 (low): null keys are excluded BY CONTRACT — the
    up-front filter keeps them out of the candidate sets AND the
    per-partition miss bounds, so the exactness proof covers exactly
    the non-null domain (pre-fix, value_counts dropped them from the
    counts but the proof silently ignored them)."""
    rows = [("hot",)] * 40 + [(None,)] * 500 + [(f"t{i}",) for i in range(20)]
    items = spark.createDataFrame(rows, "g string")
    got = sketch.topk_exact_candidates(items, key="g", k=1, capacity=64).collect()
    assert [(r.g, r.cnt, r.rn) for r in got] == [("hot", 40, 1)]
