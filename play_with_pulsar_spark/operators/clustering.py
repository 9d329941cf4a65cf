"""Distributed k-means clustering and semantic (embedding-space)
deduplication over an ``array<float>`` embedding column.

Reference parity: the reference engine has no clustering operator —
this family covers the LLM-training-data curation surface the task
brief names first-class (SemDeDup-style semantic dedup; the coarse
quantizer that `similarity.ivf_*` train on a sample is here trained
on the FULL corpus, distributed).

Scale design (the part that must survive 100 TB):

- **Assignment is shuffle-free in both kernels.** The default is an
  Arrow-batched numpy argmin (one vectorized pass per batch, no
  join/window/exchange); the alternative folds the K centroids into
  the plan as a literal ``array<struct<cl,cv>>`` with
  ``array_min(transform(...))`` — fully declarative and
  Python-worker-free, but higher-order-function lambdas are
  interpreted (not codegen), a ~10× constant. Both rank by the same
  rounded distance and agree exactly (tested).
- **The update is the only shuffle, and it is K·D wide.** The numpy
  path FUSES it with the argmin: one Arrow pass emits per-partition
  (cluster, dim) partial sums — at most K·D rows per partition
  whatever the row count (the treeAggregate shape; measured 4.6 s
  per iteration at 1M×64, K=64 on local[32]). The declarative path
  goes ``posexplode → groupBy(cluster, pos)`` with map-side partial
  aggregation. Either way the driver holds only the K·D centroid
  matrix between iterations.
- Lloyd's is iterative and therefore not single-query SQL — but with
  deterministic first-K-by-id init and a fixed iteration count the
  whole fit UNROLLS into CTEs, so the declared queries carry a full
  DuckDB oracle (``_kmeans_cte`` in queries.py mirrors this module
  constant-for-constant).

Cross-engine float protocol (same as the similarity family):
distances are ranked by ``round(dist, 6)`` with cluster-id tiebreak,
and per-dimension means are rounded to 9 decimals before becoming the
next iteration's centroids — both engines then iterate on identical
inputs, so summation-order ulps cannot compound across iterations.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Centroids = list[tuple[int, list[float]]]


def _round_half_away(x: np.ndarray, decimals: int) -> np.ndarray:
    """SQL-style ROUND (half away from zero) — ``np.round`` is
    banker's rounding, which would disagree with both engines' SQL
    ROUND exactly on the .5 grid points."""
    scale = 10.0**decimals
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


def _centroid_literal(cents: Centroids) -> Column:
    """The centroid table as a literal array<struct<cl, cv>> column —
    K·D literals folded straight into codegen.

    Round 13 (guide §4 plan-build latency — the F.expr lesson): the
    Column form paid K·D ``F.lit`` py4j round-trips PER CALL SITE
    (~1 ms each of driver latency before Spark ever saw the plan;
    kcenter's growing seed set built ~1k of them per query). The
    literal tree is built as ONE parsed SQL string instead —
    ``CAST('<repr>' AS DOUBLE)`` constant-folds to the identical
    Literal double (Java's Double.parseDouble exactly round-trips
    Python's repr), so the optimized plan and every downstream value
    are unchanged. Non-finite values (never produced by the fitters,
    but cheap to guard) fall back to the Column form, whose
    ``F.lit(float('nan'))`` handling is known-good."""
    import math

    if all(
        isinstance(x, float) and math.isfinite(x) for _, cv in cents for x in cv
    ):
        structs = ", ".join(
            "named_struct('cl', CAST({} AS BIGINT), 'cv', array({}))".format(
                int(cl),
                ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in cv),
            )
            for cl, cv in cents
        )
        return F.expr(f"array({structs})")
    return F.array(
        *[
            F.struct(
                F.lit(int(cl)).cast("bigint").alias("cl"),
                F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
            )
            for cl, cv in cents
        ]
    )


def _dist_col(em: Column, cv: Column, dist_round: int) -> Column:
    """Euclidean distance as a sequential index-order fold, matching
    DuckDB's ``list_distance`` summation order; rounded before ranking
    so blocked/FMA summation differences cannot flip an argmin."""
    sq = F.aggregate(
        F.zip_with(em, cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(F.sqrt(sq), dist_round)


def nearest_centroid(em: Column, cents: Centroids, dist_round: int = 6) -> Column:
    """struct<dist, cl> of the nearest centroid for a vector column —
    ``array_min`` over structs is lexicographic, so ties on the
    rounded distance break by cluster id (the oracle's
    ``ORDER BY dist, cluster`` does the same)."""
    scored = F.transform(
        _centroid_literal(cents),
        lambda c: F.struct(
            _dist_col(em, c.getField("cv"), dist_round).alias("dist"),
            c.getField("cl").alias("cl"),
        ),
    )
    return F.array_min(scored)


def kmeans_init(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> Centroids:
    """Deterministic init: the first ``k`` vectors by id. Engine-
    portable (no RNG to keep in sync) and exactly reproducible by the
    oracle's ``ORDER BY id LIMIT k``."""
    rows = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("em"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    return [(ci, [float(x) for x in r.em]) for ci, r in enumerate(rows)]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int = 6,
    mean_round: int = 9,
    strategy: str = "numpy",
    spherical: bool = False,
) -> Centroids:
    """Distributed Lloyd's: ``iters`` update steps from the
    deterministic init. Each step is ONE job — a zero-shuffle argmin
    stage feeding a map-side-combined (cluster, dim) mean; the driver
    materializes only the K·D centroid matrix. A cluster that loses
    all members keeps its previous centroid (the oracle's LEFT JOIN +
    coalesce mirrors this). ``strategy`` picks the argmin kernel —
    see :func:`kmeans_assign`; both rank by round(dist, 6) so they
    agree exactly (cross-kernel parity is a test).

    ``spherical=True`` trains a SPHERICAL k-means (the IVF coarse-
    quantizer objective): inputs are L2-normalized before iterating —
    argmin Euclidean on unit vectors is argmax cosine — and each
    update's mean is re-normalized (driver-side, K rows). This is the
    full-corpus distributed replacement for
    ``similarity.ivf_fit_centroids``'s driver-side sample fit: same
    objective, training cost O(N·K·D) per iteration across the
    cluster instead of capped at ``sample_limit`` rows."""
    em = F.col(vec_col).cast("array<double>")
    if spherical:
        nrm = F.sqrt(
            F.aggregate(F.transform(em, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )
        # zero-norm vectors stay zero (no defined direction) — they
        # land wherever the rounded-distance tiebreak puts them
        em = F.when(nrm > 0, F.transform(em, lambda x: x / nrm)).otherwise(em)
        df = df.select(F.col(id_col), em.alias(vec_col))
        em = F.col(vec_col)
    v = df.select(em.alias("em"))
    cents = kmeans_init(df, k, id_col, vec_col)
    for _ in range(iters):
        if strategy == "numpy":
            # fused step: ONE Arrow pass computes the argmin AND the
            # per-partition (cluster, dim) partial sums — each
            # partition emits at most K·D partial rows, so the only
            # exchange of the whole iteration is K·D·partitions wide
            # (the treeAggregate shape, without a 64M-row explode)
            means = (
                _partial_sums_numpy(v, cents, dist_round)
                .groupBy("cluster", "pos")
                .agg(F.round(F.sum("s") / F.sum("n"), mean_round).alias("m"))
                .collect()
            )
        else:
            best = nearest_centroid(F.col("em"), cents, dist_round)
            assigned = v.select("em", best.getField("cl").alias("cluster"))
            means = (
                assigned.select("cluster", F.posexplode("em"))
                .groupBy("cluster", "pos")
                .agg(F.round(F.avg("col"), mean_round).alias("m"))
                .collect()
            )
        nxt = {cl: list(cv) for cl, cv in cents}
        for r in means:
            nxt[r.cluster][r.pos] = r.m
        if spherical:
            for cl, cv in nxt.items():
                n = float(np.linalg.norm(cv))
                if n > 0:
                    nxt[cl] = [x / n for x in cv]
        cents = [(cl, nxt[cl]) for cl, _ in cents]
    return cents


def _dist_matrix(m: np.ndarray, cmat: np.ndarray, dist_round: int) -> np.ndarray:
    """(N, K) rounded Euclidean distances. One (N, D) temporary per
    centroid — never an (N, K, D) tensor — and the Σ(x-y)² form (not
    ‖v‖²-2vc+‖c‖², whose cancellation loses digits near zero)."""
    d = np.empty((m.shape[0], cmat.shape[0]), dtype=np.float64)
    for j in range(cmat.shape[0]):
        diff = m - cmat[j]
        d[:, j] = np.sqrt((diff * diff).sum(axis=1))
    return _round_half_away(d, dist_round)


def _partial_sums_numpy(
    v: DataFrame, cents: Centroids, dist_round: int
) -> DataFrame:
    """(cluster, pos, s, n) partial sums of the member vectors of each
    cluster, one set per Arrow batch — the map-side half of the Lloyd
    update, fused with the argmin so the data is read once."""
    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    cls = np.array([cents[i][0] for i in order], dtype=np.int64)
    cmat = np.stack([np.asarray(cents[i][1], dtype=np.float64) for i in order])
    k, dim = cmat.shape

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["em"].to_numpy()).astype(np.float64)
            idx = np.argmin(_dist_matrix(m, cmat, dist_round), axis=1)
            np.add.at(sums, idx, m)
            counts += np.bincount(idx, minlength=k)
        live = np.nonzero(counts)[0]
        if len(live):
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(cls[live], dim),
                    "pos": np.tile(np.arange(dim, dtype=np.int32), len(live)),
                    "s": sums[live].ravel(),
                    "n": np.repeat(counts[live], dim),
                }
            )

    return v.mapInPandas(partials, schema="cluster bigint, pos int, s double, n long")


def _assign_numpy(
    v: DataFrame, cents: Centroids, dist_round: int, carry: list[str]
) -> DataFrame:
    """Arrow-batched argmin: per batch one (N, K) pairwise-distance
    matrix (numpy, float64), rounded SQL-style before the argmin so it
    ranks identically to the fold/oracle protocol; ``np.argmin`` takes
    the FIRST minimum, which IS the cluster-id tiebreak because the
    centroid axis is ordered by cluster id. Zero exchanges — the same
    embarrassingly-parallel shape as the literal-projection strategy,
    minus the per-element interpreted-lambda cost (higher-order
    functions do not enter whole-stage codegen), which is a ~10×
    constant at corpus scale."""
    order = sorted(range(len(cents)), key=lambda i: cents[i][0])
    cls = np.array([cents[i][0] for i in order], dtype=np.int64)
    cmat = np.stack([np.asarray(cents[i][1], dtype=np.float64) for i in order])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["em"].to_numpy()).astype(np.float64)
            d = _dist_matrix(m, cmat, dist_round)
            idx = np.argmin(d, axis=1)  # first min == lowest-cluster tiebreak
            out = {c: pdf[c] for c in carry}
            out["cluster"] = cls[idx]
            out["dist"] = d[np.arange(len(idx)), idx]
            yield pd.DataFrame(out)

    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in v.schema.fields if f.name in carry
    )
    schema = (carry_schema + ", " if carry_schema else "") + "cluster bigint, dist double"
    return v.mapInPandas(assign, schema=schema)


def kmeans_assign(
    df: DataFrame,
    cents: Centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int = 6,
    keep_vec: bool = False,
    strategy: str = "numpy",
) -> DataFrame:
    """(id, cluster, dist) for every vector. Two kernels, same
    rounded-rank answer, both shuffle-free:

    - ``"numpy"`` (default): Arrow-batched pairwise-distance matmul —
      the throughput path (one vectorized kernel per batch).
    - ``"sql"``: the centroids folded into the plan as literals,
      argmin = ``array_min(transform(...))`` — zero Python workers,
      fully declarative; its per-element lambdas are interpreted (not
      codegen), so it pays ~10× the constant of the numpy kernel —
      use it where a Python-worker-free plan matters more than
      throughput.

    Both round distances to ``dist_round`` (SQL half-away rounding in
    the numpy kernel) before ranking, so the two strategies and the
    DuckDB oracle rank identically."""
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("em")
    )
    if strategy == "numpy":
        out = _assign_numpy(v, cents, dist_round, carry=[id_col, "em"])
        cols = [F.col(id_col), *(["em"] if keep_vec else []), "cluster", "dist"]
        return out.select(*cols)
    best = nearest_centroid(F.col("em"), cents, dist_round)
    return v.select(
        F.col(id_col),
        *(["em"] if keep_vec else []),
        best.getField("cl").alias("cluster"),
        best.getField("dist").alias("dist"),
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_round: int = 6,
    pair_kernel: str = "numpy",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal = k-means partition of embedding space,
    then pairwise cosine ONLY within each cluster; a document is a
    duplicate when an earlier-id neighbor in its cluster matches at
    ``>= threshold``. Returns (id, cluster, keep) for every row.

    The clustering is what makes this 100 TB-feasible: candidate
    generation is quadratic only within a cluster, and K scales with
    the corpus so clusters stay bounded (the paper's design point —
    size K for ~1-5k vectors per cluster: within-cluster work is
    O((N/K)²·K), so doubling K halves it; the gram kernel additionally
    blocks its witness axis so peak memory is O(block·cluster), never
    O(cluster²)).
    Zero-norm vectors have no defined cosine and are never marked
    duplicates (NULL similarity fails the threshold in both engines).

    ``pair_kernel``:

    - ``"numpy"`` (default): ONE exchange on the cluster id, then one
      normalized gram matrix (M·Mᵀ) per cluster group in an Arrow
      batch — the within-cluster quadratic cost runs at matmul speed,
      and ``keep`` falls out of a rounded upper-triangle any() in the
      same kernel. Cosines are rounded SQL-style (half away from
      zero) so the verdicts match the oracle's round(sim, 6).
    - ``"sql"``: declarative self-join on the cluster id with
      fold-based dots (norms precomputed per row, not per pair) —
      Python-worker-free, but pays interpreted-lambda cost per pair.
      Kernel parity is a test.
    """
    cents = kmeans_fit(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col, keep_vec=True)
    if pair_kernel == "numpy":
        def keep_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
            m = np.stack(pdf["em"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((m * m).sum(axis=1))
            ok = nrm > 0
            mn = m / np.where(ok, nrm, 1.0)[:, None]
            n = len(mn)
            # duplicate iff ANY earlier-id row (strict upper triangle,
            # rows sorted by id) matches — the greedy min-id-witness
            # rule shared by the whole dedup family. The gram matrix
            # is computed in 1024-row WITNESS blocks so peak memory is
            # O(block·n), not O(n²) — row i_local of a block starting
            # at b0 witnesses exactly the columns j > b0 + i_local,
            # i.e. np.triu(block, k=b0+1).
            dup = np.zeros(n, dtype=bool)
            for b0 in range(0, n, 1024):
                blk = mn[b0 : b0 + 1024]
                sims = _round_half_away(blk @ mn.T, sim_round)
                hit = (sims >= threshold) & ok[b0 : b0 + 1024, None] & ok[None, :]
                dup |= np.triu(hit, k=b0 + 1).any(axis=0)
            return pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": pdf["cluster"],
                    "keep": ~dup,
                }
            )

        id_type = assigned.schema[id_col].dataType.simpleString()
        return assigned.groupBy("cluster").applyInPandas(
            keep_kernel, schema=f"{id_col} {id_type}, cluster bigint, keep boolean"
        )
    dot = F.aggregate(
        F.zip_with("a_em", "b_em", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    e = assigned.select(
        F.col(id_col),
        "cluster",
        "em",
        F.sqrt(
            F.aggregate(F.transform("em", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        ).alias("nrm"),
    )
    a = e.select(
        F.col(id_col).alias("a_id"), F.col("cluster"),
        F.col("em").alias("a_em"), F.col("nrm").alias("a_nrm"),
    )
    b = e.select(
        F.col(id_col).alias("b_id"), F.col("cluster"),
        F.col("em").alias("b_em"), F.col("nrm").alias("b_nrm"),
    )
    dup_ids = (
        a.join(b, on="cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cosine",
            F.round(dot / F.nullif(F.col("a_nrm") * F.col("b_nrm"), F.lit(0.0)), sim_round),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        e.join(dup_ids, on=id_col, how="left")
        .select(
            F.col(id_col),
            "cluster",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def kcenter_seeds(
    df: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int = 6,
) -> DataFrame:
    """Greedy k-center seed selection (Gonzalez 1985, "Clustering to
    minimize the maximum intercluster distance" — the classic
    2-approximation, public): start from the minimum-id vector, then
    repeatedly pick the point FARTHEST from the chosen set. The
    selected seeds maximize coverage diversity — the curation use is
    diverse exemplar/probe selection (seed documents for active
    labeling, coverage probes for an embedding space) where k-means
    centroids would collapse onto dense regions and miss outlying
    modes.

    Output: ``(seed_rank 1..k, vec_id, dist)`` where ``dist`` is the
    seed's distance to the previously-chosen set at selection time
    (the coverage radius ladder; 0.0 for the first seed) — rounded by
    the family float protocol (``round(dist, 6)``, ties by id), so
    the unrolled DuckDB oracle reproduces every pick exactly. The
    ``vec_id`` column keeps the INPUT id column's type. Degenerate
    inputs: an empty frame raises ``ValueError``; when the distinct
    vectors are exhausted before ``k`` seeds (the farthest remaining
    point sits at rounded distance 0 from the chosen set) selection
    STOPS EARLY and returns the seeds found — duplicate vec_ids are
    never emitted.

    Scale shape: K-1 jobs, each a ZERO-shuffle literal-centroid
    argmin projection (the :func:`nearest_centroid` kernel k-means
    assignment uses) feeding ONE all-reduce ``min(struct)`` — no
    exchange wider than a single row ever forms, and the driver holds
    only the growing K×D seed matrix. Gonzalez at 100 TB is exactly
    K linear scans."""
    id_type = dict(df.dtypes)[id_col]
    emb = df.select(
        F.col(id_col).alias("i"), F.col(vec_col).cast("array<double>").alias("em")
    )
    head = emb.orderBy("i").limit(1).collect()
    if not head:
        raise ValueError("kcenter_seeds: empty input")
    first = head[0]
    seeds: list[tuple[object, float, list[float]]] = [
        (first.i, 0.0, [float(x) for x in first.em])
    ]
    for _ in range(1, k):
        cents: Centroids = [(j, s[2]) for j, s in enumerate(seeds)]
        nc = nearest_centroid(F.col("em"), cents, dist_round)
        # min(struct(-dist, id, em)) = (max dist, ties by smaller id);
        # em rides along only to avoid a second lookup job — (dist, id)
        # is already unique, so the array field is never compared.
        pick = (
            emb.select(
                F.struct(
                    (-nc["dist"]).alias("nd"),
                    F.col("i").alias("i"),
                    F.col("em").alias("em"),
                ).alias("s")
            )
            .agg(F.min("s").alias("m"))
            .collect()[0]["m"]
        )
        if float(-pick.nd) == 0.0:
            break  # distinct vectors exhausted — never re-pick a seed
        seeds.append((pick.i, float(-pick.nd), [float(x) for x in pick.em]))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r + 1, s[0], s[1]) for r, s in enumerate(seeds)],
        f"seed_rank int, vec_id {id_type}, dist double",
    )
