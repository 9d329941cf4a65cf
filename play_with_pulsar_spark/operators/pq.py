"""Product quantization for ANN (Jégou et al. 2011, "Product
quantization for nearest neighbor search" — public): split each
D-dim vector into ``m`` subvectors, learn a small k-means codebook
per subspace, store each vector as ``m`` small codes, and answer
queries by ASYMMETRIC DISTANCE COMPUTATION (ADC) — the query stays
exact, every corpus distance is a sum of per-subspace
query-to-centroid distances looked up by code.

This is the third memory rung of the engine's ANN family:
  float32 corpus (4 bytes/dim) → int8 scalar quantization
  (1 byte/dim, ``similarity.quantize_embeddings``) → PQ
  (m codes per VECTOR — e.g. 8 bytes for a 64-dim vector, 32×
  smaller than float32). At 100 TB the codes table is what an index
  stores and scans; the codebooks are m·k·(D/m) doubles of driver/
  broadcast state (the model, bounded by contract like the k-means
  centroids).

Training reuses the distributed Lloyd's machinery of
``operators/clustering.py`` per subspace (deterministic
first-k-by-id init, rounded-distance ranking), so the ENTIRE fit +
encode + ADC ranking unrolls into a DuckDB oracle exactly like
``cluster_kmeans_assign`` — an approximate index that is still
value-hash-checkable, because approximation here is quantization, not
nondeterminism.

Scale shapes:
- fit: m × (one Lloyd job per iteration) — each a zero-shuffle argmin
  feeding a map-side-combined (cluster, dim) mean; m small (8).
- encode: ONE projection with m literal-codebook argmins — no
  shuffle, no Python worker; rides inside the corpus scan.
- ADC: broadcast query × codes scan; per-row work is m array lookups
  + m ordered 8-term folds, all codegen; top-k per query by window
  over the rounded distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .clustering import Centroids, kmeans_fit, nearest_centroid

Codebooks = list[Centroids]  # one Centroids list per subspace


def _subvec(em: F.Column, j: int, d_sub: int) -> F.Column:
    """1-based slice of subspace j (0-based) from a vector column."""
    return F.slice(em, j * d_sub + 1, d_sub)


def pq_fit(
    df: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Learn ``m`` per-subspace codebooks of ``k_sub`` centroids each
    with the deterministic distributed Lloyd's of ``kmeans_fit``.
    The vector dimension must divide evenly by ``m`` (asserted from
    one collected row — bounded)."""
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("pq_fit: empty corpus")
    dim = int(first["d"])
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    em = F.col(vec_col).cast("array<double>")
    books: Codebooks = []
    for j in range(m):
        sub = df.select(F.col(id_col), _subvec(em, j, d_sub).alias(vec_col))
        books.append(
            kmeans_fit(sub, k=k_sub, iters=iters, id_col=id_col, vec_col=vec_col)
        )
    return books


def pq_encode(
    df: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int = 6,
) -> DataFrame:
    """(id, codes array<int>) — ONE literal-codebook projection, zero
    shuffles, zero Python workers. Ties on the rounded subspace
    distance break by centroid id (the ``nearest_centroid``
    contract, mirrored by the oracle)."""
    em = F.col(vec_col).cast("array<double>")
    d_sub = len(books[0][0][1])
    code_cols = [
        nearest_centroid(_subvec(em, j, d_sub), books[j], dist_round)
        .getField("cl")
        .cast("int")
        for j in range(len(books))
    ]
    return df.select(F.col(id_col), F.array(*code_cols).alias("codes"))


def _book_literal(book: Centroids) -> F.Column:
    """array<array<double>> literal of a codebook, index = code + 1."""
    return F.array(
        *[
            F.array(*[F.lit(float(x)) for x in cv])
            for _, cv in sorted(book, key=lambda t: t[0])
        ]
    )


def pq_adc_topk(
    codes: DataFrame,
    books: Codebooks,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    term_round: int = 6,
) -> DataFrame:
    """ADC top-k: for every query, rank the CODES table (never the
    vectors) by Σ_j ||q_j − centroid(code_j)||², each subspace term
    an ordered codegen fold rounded to ``term_round`` before the
    fixed-order sum (so both engines rank the identical doubles).
    Returns (query_id, neighbor_id, adc_dist, rn ≤ k); a query never
    matches itself."""
    m = len(books)
    d_sub = len(books[0][0][1])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    terms = []
    for j in range(m):
        cent = F.element_at(_book_literal(books[j]), F.element_at("codes", j + 1) + 1)
        terms.append(
            F.round(
                F.aggregate(
                    F.zip_with(
                        _subvec(F.col("qv"), j, d_sub),
                        cent,
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                term_round,
            )
        )
    adc = F.round(sum(terms[1:], terms[0]), term_round)
    scored = (
        codes.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist", adc)
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rn")
    )


def pq_rerank_topk(
    codes: DataFrame,
    books: Codebooks,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_round: int = 6,
) -> DataFrame:
    """The production PQ pattern (Jégou et al. 2011 §IV): ADC over the
    codes picks a ``shortlist``, then ONLY the shortlisted full
    vectors are read for an exact re-rank — at 100 TB the float
    corpus is touched for shortlist·queries rows, never scanned. The
    exact stage is the ``_dist_col`` sequential fold (bitwise equal
    to the oracle's list_distance), so the whole two-stage pipeline
    stays hash-checkable. Returns (query_id, neighbor_id, dist,
    rn ≤ k)."""
    from .clustering import _dist_col

    cand = pq_adc_topk(
        codes, books, queries, k=shortlist, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    rer = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("dist", _dist_col(F.col("qv"), F.col("cv"), dist_round))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "dist", "rn")
    )
