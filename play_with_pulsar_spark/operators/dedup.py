"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the whole point of these):

- **exact_dedup** — hash-groupBy on a content fingerprint. One
  shuffle on md5(text); with map-side partial agg the shuffle carries
  one row per distinct fingerprint per partition.
- **ngram_jaccard_pairs** — the exact near-dup ground truth.
  Inverted-index self-join on shingles. The frequency cap
  (``max_shingle_freq``) drops stop-shingles before the join: a
  shingle appearing in f docs creates f² candidate pairs, so skew
  control IS the cap (plus AQE skew-join as backstop). Quadratic in
  docs-per-shingle, not in corpus size.
- **minhash_signatures / lsh_candidate_pairs** — the 100 TB path.
  k independent permutation hashes h_i(x) = (a_i·x + b_i) mod p over
  64-bit shingle hashes (xxhash64, JVM-side), banded so only same-
  band-bucket docs join. Candidate generation never compares all
  pairs; the verify step computes true Jaccard only for candidates.
- **simhash64** — 64-bit near-dup fingerprint; hamming-close
  signatures = near-dups. Vectorized numpy bit-count, Arrow-batched.
- **build_ngram_index / build_minhash_index + incremental_*_pairs**
  — the operational path: screen each new batch against MATERIALIZED
  index tables instead of re-shingling the corpus (O(batch) work per
  batch, not O(corpus)); equals the batch run on the union restricted
  to touching-new pairs. ``streaming/curator.py`` wires this into a
  foreachBatch continuous-curation pipeline.

References: Broder, "On the resemblance and containment of
documents" (1997); Leskovec/Rajaraman/Ullman MMDS ch.3 (minhash/LSH
banding); Charikar (2002) for SimHash. Public-knowledge algorithms,
implemented Spark-first.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import exploded_ngrams, fingerprint_md5

_LOG = logging.getLogger(__name__)

# Mersenne prime 2^31-1: modulus for the affine permutation hashes.
# 31-bit values keep a·h + b well inside 64-bit range (no overflow —
# which would be a runtime error under Spark 4's default ANSI mode).
_MERSENNE = (1 << 31) - 1


def _register_cached(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted intermediates to the result for later release.

    The dedup operators persist small intermediates (batch grams,
    banded signatures, candidate-restricted gram tables) that multiple
    branches of one returned plan consume. The operators return LAZY
    DataFrames, so they cannot unpersist before returning — the caller
    hasn't executed anything yet. Instead the persisted handles ride
    on the result; ``release_intermediates(df)`` frees them once the
    caller has materialized what it needs. Long-lived sessions (the
    streaming curator's per-batch loop) MUST call it — otherwise one
    persisted table per batch accumulates until eviction churn."""
    existing = list(getattr(result, "_pwp_cached", ())) + list(cached)
    for src in cached:
        existing.extend(getattr(src, "_pwp_cached", ()))
    result._pwp_cached = existing
    return result


def release_intermediates(df: DataFrame) -> None:
    """Unpersist every intermediate an operator cached for this result.

    Call AFTER materializing (collect/write) — for plain persisted
    intermediates the plan stays valid either way (Spark recomputes
    unpersisted parents), but releasing early forfeits the reuse the
    persist existed for. EXCEPTION: a result whose lineage was
    truncated by localCheckpoint (``dedup_clusters``) is SINGLE-USE
    after release — the freed checkpoint blocks cannot be recomputed,
    so further actions on that DataFrame raise.

    Call it on the EXACT DataFrame the operator returned: the cached
    handles ride as a Python attribute, which no DataFrame
    transformation propagates — ``release_intermediates(result
    .filter(...))`` is a silent no-op that leaks the persisted
    intermediates for the session's lifetime. Capture the original
    handle before deriving new frames."""
    for cached in getattr(df, "_pwp_cached", ()):
        try:
            cached.unpersist()
        except Exception:  # session already stopped, etc. — releasing
            pass  # storage is best-effort by design
    df._pwp_cached = []


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical row per distinct content: min id + copy count."""
    return (
        docs.groupBy(fingerprint_md5(text_col).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1
    shingle; returns pairs (id_a < id_b) with jaccard ≥ threshold.

    Set ``max_shingle_freq`` to drop shingles occurring in more than
    f documents before the self-join (standard stop-shingle trick) —
    mandatory at scale, optional for exactness on small corpora.

    The self-join runs on xxhash64(shingle) rather than the shingle
    string: smaller shuffle rows and much smaller join codegen (the
    string-compare sort-merge stage was measured at 20s+ of
    compile+JIT in long-lived sessions). A 64-bit collision inflates
    one pair's intersection by 1; P(any collision) ≈ d²/2⁶⁵ for d
    distinct shingles — ~1e-11 at oracle scale, and a ±1/n jaccard
    perturbation at any scale, far below the threshold granularity.
    """
    from pyspark.sql import Window

    # gram table materialized at ONE doc_id exchange: the df-cap
    # aggregate, the per-doc sizes, and the self-join's two sides
    # otherwise each re-run tokenize + n-gram + xxhash from the scan.
    # Round 13 refinements (stage-trace verified): (a) the uniform
    # isnotnull(doc_id) guard — the self-join's a.doc_id < b.doc_id
    # inferred it into the join branches only, splitting their
    # exchange subtrees off the aggregate branches'; value-identical
    # because a NULL id can never satisfy the < predicate, so no pair
    # ever carried one; (b) sizes ride a WINDOW on the exchange's own
    # partitioning instead of a groupBy+join — the aggregate was a
    # third consumer whose ColumnPruning-specialized copy (doc_id
    # only) re-executed the whole gram map stage; the window leaves
    # the gram table with exactly TWO byte-identical consumers (the
    # join sides), which ReuseExchange unifies into ONE execution.
    # Jaccard arithmetic is unchanged (same ints, same division).
    grams = (
        exploded_ngrams(docs, text_col, id_col, n)
        .select("doc_id", F.xxhash64("g").alias("g"))
        .where(F.col("doc_id").isNotNull())
        .repartition("doc_id")
    )
    if max_shingle_freq is not None:
        # drop stop-shingles via broadcast ANTI-join against the
        # df > cap set: stop-shingles are FEW by construction, so the
        # filter costs one broadcast instead of shuffling the full
        # gram table against an almost-as-large "rare" set.
        # count("doc_id") == count(1) here (the guard above makes
        # doc_id non-null) but it keeps this aggregate's pruned
        # column set equal to the probe side's so the pre-cap gram
        # subtree stays reusable.
        common = (
            grams.groupBy("g").agg(F.count("doc_id").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("g")
        )
        grams = grams.join(F.broadcast(common), "g", "anti")
    sized = grams.select(
        "doc_id",
        "g",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id"))
        .alias("n_grams"),
    )
    a = sized.alias("a")
    b = sized.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_grams")).alias("na"),
            F.first(F.col("b.n_grams")).alias("nb"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _perm_params(num_hashes: int, seed: int) -> tuple[list[int], list[int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).tolist()
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).tolist()
    return a, b


def minhash_signatures(
    docs: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 128,
    seed: int = 42,
    grams: DataFrame | None = None,
    flag_col: str | None = None,
) -> DataFrame:
    """(doc_id, sig: array<bigint>[num_hashes]) — min over shingles of
    affine permutations of xxhash64(shingle).

    Shingle hashing stays JVM-side (xxhash64); the k affine mins are a
    single vectorized numpy kernel over range-partitioned, doc-sorted
    grams (one (n_grams × k) matrix op + ``minimum.reduceat`` per
    Arrow batch, with cross-batch carry). A pure-SQL formulation needs
    k separate min-aggregates, whose generated method is so large that
    Janino recompilation (whenever the codegen cache evicts it) costs
    more than the aggregation itself — measured 8s+ per recompile at
    k=128. repartitionByRange guarantees each doc's rows land in one
    partition, so the carry logic is exact.

    ``flag_col``: name of a per-doc-constant boolean column on
    ``grams`` to carry through to the output (one value per doc, the
    group's first) — lets a caller sign the UNION of two gram tables
    in ONE kernel pass and still tell the sides apart downstream (the
    incremental screen's one-pass mode)."""
    a_params, b_params = _perm_params(num_hashes, seed)
    A = np.asarray(a_params, dtype=np.int64)[None, :]
    B = np.asarray(b_params, dtype=np.int64)[None, :]

    if grams is None:
        grams = exploded_ngrams(docs, text_col, id_col, n)
    flag_sel = [F.col(flag_col)] if flag_col else []
    g_hashed = grams.select(
        "doc_id",
        *flag_sel,
        # unsigned-ify xxhash64 into [0, 2^31-1) via pmod: 31-bit
        # values keep h·a + b inside int64 for the numpy kernel too
        F.pmod(F.xxhash64("g"), F.lit(_MERSENNE)).alias("h"),
    )

    def kernel(batches):
        carry_doc = None
        carry_min = None
        carry_flag = None
        for pdf in batches:
            if pdf.empty:
                continue
            d = pdf["doc_id"].to_numpy()
            h = pdf["h"].to_numpy(dtype=np.int64)
            fl = pdf[flag_col].to_numpy() if flag_col else None
            m = (h[:, None] * A + B) % _MERSENNE  # (n, k)
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            mins = np.minimum.reduceat(m, starts, axis=0)
            doc_ids = d[starts]
            flags = fl[starts] if flag_col else None
            if carry_doc is not None:
                if doc_ids[0] == carry_doc:
                    mins[0] = np.minimum(mins[0], carry_min)
                else:
                    out = {"doc_id": [carry_doc], "sig": [carry_min.tolist()]}
                    if flag_col:
                        out[flag_col] = [carry_flag]
                    yield pd.DataFrame(out)
            carry_doc = int(doc_ids[-1])
            carry_min = mins[-1]
            if flag_col:
                carry_flag = bool(flags[-1])
            if len(doc_ids) > 1:
                out = {
                    "doc_id": doc_ids[:-1],
                    "sig": [r.tolist() for r in mins[:-1]],
                }
                if flag_col:
                    out[flag_col] = flags[:-1]
                yield pd.DataFrame(out)
        if carry_doc is not None:
            out = {"doc_id": [carry_doc], "sig": [carry_min.tolist()]}
            if flag_col:
                out[flag_col] = [carry_flag]
            yield pd.DataFrame(out)

    schema = "doc_id long, sig array<bigint>"
    if flag_col:
        schema += f", {flag_col} boolean"
    sorted_grams = g_hashed.repartitionByRange("doc_id").sortWithinPartitions("doc_id")
    return sorted_grams.mapInPandas(kernel, schema=schema)


def _banded(
    signatures: DataFrame,
    num_bands: int,
    rows_per_band: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id[, *extra_cols], band, bucket) — one row per band per
    doc; ``extra_cols`` are carried through unchanged.

    bucket = xxhash64 over the band's signature longs directly — no
    string casts/concat (smaller codegen, cheaper per row than hashing
    a concatenated string; band id is the first hash input so
    identical sig values in different bands never collide)."""
    return signatures.select(
        "doc_id",
        *extra_cols,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def _cap_groups(df: DataFrame, keys: list[str], max_size: int) -> DataFrame:
    """Drop key groups larger than ``max_size`` before a group
    self-join — the bucket-level twin of the stop-shingle cap. A
    group with f members creates f² candidate pairs, so one viral
    boilerplate cluster can dominate the whole join; oversized groups
    are near-identical content that exact dedup (run it first) or a
    dedicated boilerplate pass should own, not the pairwise path."""
    small = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") <= max_size)
        .select(*keys)
    )
    return df.join(small, keys)


def _cap_buckets(banded: DataFrame, max_bucket_size: int) -> DataFrame:
    """MinHash form of :func:`_cap_groups` on (band, bucket)."""
    return _cap_groups(banded, ["band", "bucket"], max_bucket_size)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_bands: int = 32,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature, bucket-join per band, union the candidate
    pairs. Only docs agreeing on a whole band ever meet in the join —
    the all-pairs comparison never happens. ``max_bucket_size``
    additionally bounds the per-bucket join fan-out (see
    ``_cap_buckets``); default None preserves exact recall."""
    # persist: the self-join consumes the banded table on BOTH sides —
    # without it the signature kernel (mapInPandas + its exchange)
    # executes twice (visible as two MapInPandas subtrees in PLANS.md)
    cached = _banded(signatures, num_bands, rows_per_band).persist()
    banded = cached
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return _register_cached(
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct(),
        cached,
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → banded candidates →
    exact-Jaccard verification of candidates only. Returns verified
    near-dup pairs (id_a < id_b, jaccard).

    ``broadcast_candidates``: True (default) pins the verify stage's
    candidate/size tables as BINDING broadcasts — correct whenever the
    LSH premise holds (bounded buckets ⇒ bounded candidates, which
    ``max_bucket_size`` enforces mechanically). On an uncapped run over
    a corpus where viral buckets are possible, pass False so the
    planner keeps its shuffle-join fallback — the same escape hatch as
    ``broadcast_batch`` on the incremental paths."""
    # the shingle table feeds BOTH the signature branch and the
    # verification branch of the DAG; persist it so the scan +
    # tokenize + explode runs once (storage ~ O(corpus tokens)).
    # Shingles are hashed to longs up front (see ngram_jaccard_pairs
    # on the collision bound) — both branches consume the hash.
    grams = exploded_ngrams(docs, text_col, id_col, n).select(
        "doc_id", F.xxhash64("g").alias("g")
    ).persist()
    sigs = minhash_signatures(None, num_hashes=num_hashes, seed=seed, grams=grams)
    cands = lsh_candidate_pairs(sigs, num_bands, num_hashes // num_bands, max_bucket_size)
    return _register_cached(
        _verify_jaccard(cands, grams, threshold, broadcast_candidates), grams
    )


def _verify_jaccard(
    cands: DataFrame,
    grams: DataFrame,
    threshold: float,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact Jaccard over CANDIDATE pairs only: join each side's
    hashed shingles, count the agreement, filter by threshold. Cost is
    O(candidate pairs × grams/doc), never all-pairs.

    The gram table is first restricted (semi-join) to docs that
    actually appear in a candidate pair, and that small table is what
    the three consumers (sizes, both join sides) scan — one pass over
    the full table instead of three, which is what keeps this viable
    when ``grams`` is a corpus-scale index.

    ``broadcast_candidates=False`` drops every BINDING broadcast hint
    (candidates, ids, size tables), restoring the planner's shuffle
    fallback for callers whose candidate set is not bounded by a
    bucket cap (giant uncapped batches — the escape hatches the
    incremental paths document)."""
    bcast = F.broadcast if broadcast_candidates else (lambda df: df)
    # candidates are consumed by ids (below) and the intersection join;
    # without a persist each consumer RE-EXECUTES the whole candidate
    # generation (banded self-join + distinct) — three executions per
    # run before round 12 (ids was a two-branch union), at any scale.
    # The table is bounded by the LSH premise, so the cache is tiny.
    cands = cands.persist()
    ids = cands.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("doc_id")
    ).distinct()
    # ids ≤ 2·|candidates| — tiny by the LSH premise; broadcasting it
    # keeps the corpus-scale gram table un-shuffled in the semi-join
    grams = grams.join(bcast(ids), "doc_id", "semi").persist()
    restricted = grams  # registered on the result below
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    ga = grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    gb = grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    # cands and sizes are both bounded by the LSH premise (the same
    # bound that lets `ids` broadcast above) — explicit hints pin the
    # broadcast plan so the restricted gram table never shuffles for
    # these joins regardless of AQE's estimates
    inter = (
        bcast(cands).join(ga, "id_a")
        .join(gb, "id_b")
        .filter(F.col("ga") == F.col("gb"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"))
    result = (
        inter.join(bcast(sa), "id_a")
        .join(bcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # propagate whatever the candidate generator persisted (banded
    # tables etc.) — double release is harmless, a dropped handle leaks
    return _register_cached(
        result, restricted, cands, *getattr(cands, "_pwp_cached", ())
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a materialized index
#
# The 100 TB operational reality: the corpus is deduped ONCE, then
# every new crawl batch must be screened against it. Re-running the
# batch pipeline over corpus ∪ batch re-shingles and re-hashes the
# full history every time — O(corpus) work per batch. The incremental
# path materializes the per-doc shingle table (and, for the LSH form,
# the minhash signatures) as an INDEX, and each batch does only
# O(batch + matching-index-rows) join work. At cluster scale, write
# the index bucketed BY the join key (`g` / band bucket) so the probe
# join is shuffle-free on the index side and partition-pruned.
# ---------------------------------------------------------------------------


def build_ngram_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, g) hashed-shingle inverted index — the materialized
    state for incremental exact-Jaccard dedup. O(corpus tokens) longs;
    materialize with ``write_ngram_index`` (bucketed by ``g``) and
    append each accepted batch's rows to keep it current."""
    return exploded_ngrams(docs, text_col, id_col, n).select(
        "doc_id", F.xxhash64("g").alias("g")
    )


def write_ngram_index(
    grams: DataFrame, table: str, n_buckets: int = 32, path: str | None = None
) -> None:
    """Materialize the shingle index bucketed+sorted by ``g``.

    The probe join in ``incremental_jaccard_pairs`` is keyed on ``g``;
    a g-bucketed index means the sort-merge fallback shuffles ONLY the
    batch side into the index's existing layout (no Exchange, no sort
    on the corpus-scale side — asserted in test_incremental_dedup).
    At 100 TB this is the difference between moving the corpus every
    batch and never moving it.

    ``path`` makes the table external (files survive the session
    catalog — see ``bucketing.write_bucketed``)."""
    from .bucketing import write_bucketed

    write_bucketed(grams, table, ["g"], n_buckets=n_buckets, path=path)


def build_df_index(grams: DataFrame) -> DataFrame:
    """(g, df) per-shingle document frequency over a gram table — the
    MAINTAINABLE aggregate the incremental screens' docstrings promise
    (round 7): gram tables are distinct-per-doc (``build_ngram_index``
    dedups shingles within a doc), so df is a plain row count per
    hash, and the aggregate is ADDITIVE across disjoint-id batches:
    ``merge_df_index(df_index(corpus), df_index(batch))`` equals
    ``df_index(corpus ∪ batch)`` exactly (tested). Maintain it next to
    the gram index — append each accepted batch's df rows and fold
    with ``merge_df_index`` at compaction — and the per-batch
    stop-shingle cap stops costing an O(corpus-gram-rows) recount."""
    return grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))


def merge_df_index(*indexes: DataFrame) -> DataFrame:
    """Fold several (g, df) tables into one by summing df — the
    compaction step for a maintained df index. Valid because the
    underlying doc-id sets are disjoint (the same precondition every
    incremental screen carries)."""
    if not indexes:
        raise ValueError("merge_df_index: pass at least one index")
    out = indexes[0]
    for ix in indexes[1:]:
        out = out.unionByName(ix)
    return out.groupBy("g").agg(F.sum("df").cast("long").alias("df"))


def write_minhash_index(
    grams: DataFrame,
    sigs: DataFrame | None,
    prefix: str,
    num_bands: int = 16,
    rows_per_band: int = 4,
    n_buckets: int = 32,
    banded: DataFrame | None = None,
    path_prefix: str | None = None,
) -> None:
    """Materialize the MinHash-LSH index as two bucketed tables:

    - ``{prefix}_banded`` (doc_id, band, bucket) bucketed by
      (band, bucket) — the candidate-probe side; a batch screen joins
      it on exactly those keys, so the corpus side needs no Exchange.
    - ``{prefix}_grams`` (doc_id, g) bucketed by doc_id — the verify
      side; ``_verify_jaccard`` restricts it by candidate doc ids.

    Appending an accepted batch = appending its grams and banded rows
    (both deterministic in (seed, text) — the property the
    incremental == batch equality test pins).

    Pass ``banded`` to materialize an ALREADY-banded table (e.g. the
    streaming curator's accumulated state) instead of banding
    ``sigs`` here."""
    from .bucketing import write_bucketed

    if sigs is None and banded is None:
        raise ValueError("write_minhash_index: pass sigs or banded")

    write_bucketed(
        grams,
        f"{prefix}_grams",
        ["doc_id"],
        n_buckets=n_buckets,
        path=None if path_prefix is None else f"{path_prefix}_grams",
    )
    if banded is None:
        banded = _banded(sigs, num_bands, rows_per_band)
    write_bucketed(
        banded,
        f"{prefix}_banded",
        ["band", "bucket"],
        n_buckets=n_buckets,
        path=None if path_prefix is None else f"{path_prefix}_banded",
    )


def read_minhash_index(spark, prefix: str) -> tuple[DataFrame, DataFrame]:
    """(grams, banded) handles onto a ``write_minhash_index`` layout."""
    return spark.table(f"{prefix}_grams"), spark.table(f"{prefix}_banded")


def _touching_new_pairs(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Join a (new-side rows) against b (all rows, flagged `is_new`)
    on `keys`, emitting each qualifying pair exactly once as
    (id_a < id_b). An old partner is always kept; a new partner only
    from the lexicographically smaller initiator — that rule is what
    stops new×new pairs being counted twice (once per direction)."""
    cond = (F.col("a.doc_id") != F.col("b.doc_id")) & (
        ~F.col("b.is_new") | (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return a.alias("a").join(b.alias("b"), cond).select(
        F.least("a.doc_id", "b.doc_id").alias("id_a"),
        F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
    )


def incremental_jaccard_pairs(
    index_grams: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    broadcast_batch: bool = True,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs between a new batch and an indexed corpus
    (plus new×new pairs), WITHOUT re-shingling the corpus.

    Contract: returns exactly what ``ngram_jaccard_pairs`` on
    corpus ∪ batch would return, restricted to pairs touching ≥1 new
    doc. The stop-shingle cap is computed over the union (same
    semantics as the batch run).

    ``index_df`` (round 7): a MAINTAINED (g, df) aggregate over the
    indexed corpus (``build_df_index`` / ``merge_df_index``). When
    given, the union df driving the stop-shingle cap is computed as
    stored-df ⊕ batch-df — a vocabulary-sized outer join plus an
    O(batch) aggregate — instead of recounting over the corpus-scale
    gram table every batch. Identical semantics (doc-id sets are
    disjoint so the dfs add exactly; equality pinned in
    test_incremental_dedup); at 100 TB this removes the last
    O(corpus) aggregation from the per-batch screen. Ignored when
    ``max_shingle_freq`` is None.

    Precondition (both incremental forms): batch doc_ids are disjoint
    from the indexed corpus — re-screening an already-indexed id would
    double that doc's shingle rows and skew its sizes.

    ``broadcast_batch``: see ``incremental_minhash_pairs`` — the hint
    is BINDING; pass False for batches too large to broadcast.
    """
    new_grams = build_ngram_index(new_docs, text_col, id_col, n).persist()
    index_side = index_grams.select("doc_id", "g")
    cached = [new_grams]

    if max_shingle_freq is not None:
        # Stop-shingle cap over the UNION (identical semantics to the
        # batch run). Formulated as a broadcast ANTI-join against the
        # df > cap set: stop-shingles are FEW by construction (only
        # boilerplate exceeds the cap), so the corpus side is filtered
        # without being re-partitioned — its storage bucketing (see
        # ``write_ngram_index``) survives into the probe join.
        if index_df is not None:
            # maintained-df path: stored corpus df ⊕ O(batch) batch df
            # — nothing corpus-scale is aggregated
            batch_df = new_grams.groupBy("g").agg(
                F.count(F.lit(1)).alias("_df_b")
            )
            union_df = (
                index_df.select("g", F.col("df").alias("_df_i"))
                .join(batch_df, "g", "full")
                .select(
                    "g",
                    (
                        F.coalesce(F.col("_df_i"), F.lit(0))
                        + F.coalesce(F.col("_df_b"), F.lit(0))
                    ).alias("df"),
                )
            )
        else:
            # recount path: the one remaining O(corpus) aggregation
            union_df = (
                index_side.select("g").unionByName(new_grams.select("g"))
                .groupBy("g").agg(F.count(F.lit(1)).alias("df"))
            )
        common = (
            union_df.filter(F.col("df") > max_shingle_freq)
            .select("g")
            .persist()
        )
        cached.append(common)
        index_side = index_side.join(F.broadcast(common), "g", "anti")
        new_grams_f = new_grams.join(F.broadcast(common), "g", "anti")
    else:
        new_grams_f = new_grams

    # Probe = (batch × index) ∪ (batch × batch): the index is NEVER
    # unioned under the join, so its side keeps the storage layout.
    # ``broadcast_batch=True`` (default) HINTS the batch side — a hint
    # is binding, not advisory: it bypasses autoBroadcastJoinThreshold
    # entirely, so a batch whose gram table exceeds executor memory /
    # the 8 GB broadcast cap must pass ``broadcast_batch=False`` to
    # get the sort-merge plan that shuffles only the batch side into
    # the index bucketing. The ``!=`` guard drops the nonsense
    # self-rows an (erroneous) batch/index id overlap would emit —
    # note it does NOT repair an overlap: duplicated gram rows still
    # double-count intersections for the doc's CROSS pairs (a
    # true-1.0 pair scores ~2.0 → over-rejection of neighbors), which
    # is exactly why the disjoint-id precondition exists and why the
    # curator excludes its own batch partition on replay.
    probe = F.broadcast(new_grams_f) if broadcast_batch else new_grams_f
    xi = (
        index_side.alias("b")
        .join(
            probe.alias("a"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("id_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("id_b"),
        )
    )
    nn = (
        new_grams_f.alias("a")
        .join(
            new_grams_f.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    inter = (
        xi.unionByName(nn).groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter"))
    ).persist()
    cached.append(inter)

    # Sizes only for docs that appear in some pair (broadcast semi-
    # join) — not an O(corpus) per-doc aggregation per batch.
    ids = (
        inter.select(F.col("id_a").alias("doc_id"))
        .unionByName(inter.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    capped_union = index_side.unionByName(new_grams_f)
    sizes = (
        capped_union.join(F.broadcast(ids), "doc_id", "semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_grams").alias("nb"))
    result = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _register_cached(result, *cached)


def build_minhash_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(grams, signatures) — the two tables to materialize for
    incremental MinHash-LSH dedup. Signatures are deterministic in
    (seed, shingles), so index rows computed in past batches stay
    bit-identical to what a fresh run would produce — the property
    the incremental == batch equality test pins.

    The gram table is persisted: when the index is built inline (not
    yet materialized to parquet) both the signature kernel and the
    verify step consume it, and without the persist the corpus would
    be re-tokenized per consumer."""
    grams = build_ngram_index(docs, text_col, id_col, n).persist()
    sigs = minhash_signatures(None, num_hashes=num_hashes, seed=seed, grams=grams)
    return grams, sigs


def incremental_minhash_pairs(
    index_grams: DataFrame,
    index_sigs: DataFrame | None,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    index_banded: DataFrame | None = None,
    broadcast_batch: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup screen of a new batch against an indexed
    corpus — the scale path. Only the BATCH is shingled and signed;
    the corpus contributes pre-computed index rows. Candidates arise
    from band-bucket collisions (new vs all), and exact Jaccard
    verifies candidates only. Equals ``minhash_dedup_pairs`` on
    corpus ∪ batch restricted to pairs touching ≥1 new doc (same
    seed/geometry), which the test suite asserts.

    Pass ``index_banded`` (a ``write_minhash_index`` table) to probe a
    MATERIALIZED index: the stored layout is bucketed by the join key,
    and since the batch side broadcasts, the corpus-side scan feeds
    the candidate join with no Exchange at all (plan-asserted in
    test_incremental_dedup). Otherwise ``index_sigs`` is banded
    inline.

    ``index_sigs=None`` AND ``index_banded=None`` selects the
    ONE-PASS inline-build mode (round 7): signatures for the index
    AND the batch are computed from the gram union in a single range
    exchange + a single Arrow kernel (per-doc flag threaded through),
    instead of two exchanges + two Python stages. Semantically
    identical — signatures are per-doc deterministic in (seed,
    shingles) — and measured ~25% faster on the declared inline-build
    query; use it whenever the index signatures do not already exist
    (when they DO exist — read from parquet — passing them is cheaper
    than re-signing the corpus).

    ``max_bucket_size`` must count index AND batch members per
    bucket, so capping routes through the unioned table — an
    O(index-banded-rows) scan; leave it None on the stored-index path
    unless viral buckets are actually observed.

    ``broadcast_batch`` (both incremental functions): True HINTS the
    batch side into the candidate join. The hint is BINDING — it
    bypasses ``autoBroadcastJoinThreshold``, so a batch too large to
    broadcast must pass False to get the sort-merge plan (only the
    batch side shuffles into the index layout). On the capped path
    the hint attaches to the new side of the union self-join; the
    union itself still re-partitions the index side (the cost of
    exact per-bucket counting).
    """
    rows_per_band = num_hashes // num_bands
    new_grams = build_ngram_index(new_docs, text_col, id_col, n).persist()
    cached = [new_grams]
    onepass = index_sigs is None and index_banded is None
    if onepass:
        # one-pass mode: sign index ∪ batch grams together — ONE range
        # exchange + ONE Arrow kernel; the per-doc is_new flag rides
        # the kernel so the sides separate with no join afterwards
        union_grams = (
            index_grams.select("doc_id", "g").withColumn("is_new", F.lit(False))
            .unionByName(
                new_grams.select("doc_id", "g").withColumn("is_new", F.lit(True))
            )
        )
        sigs = minhash_signatures(
            None, num_hashes=num_hashes, seed=seed, grams=union_grams,
            flag_col="is_new",
        )
        all_banded = _banded(
            sigs, num_bands, rows_per_band, extra_cols=("is_new",)
        ).persist()
        cached.append(all_banded)
        new_banded = all_banded.filter(F.col("is_new"))
    else:
        new_sigs = minhash_signatures(
            None, num_hashes=num_hashes, seed=seed, grams=new_grams
        )
        if index_banded is None:
            index_banded = _banded(index_sigs, num_bands, rows_per_band)
        new_banded = _banded(new_sigs, num_bands, rows_per_band).persist()
        cached.append(new_banded)
        all_banded = (
            index_banded.withColumn("is_new", F.lit(False))
            .unionByName(new_banded.withColumn("is_new", F.lit(True)))
        )

    if max_bucket_size is not None:
        if not onepass:
            all_banded = all_banded.persist()
            cached.append(all_banded)
        capped = _cap_buckets(all_banded, max_bucket_size)
        new_side = capped.filter(F.col("is_new"))
        if broadcast_batch:
            new_side = F.broadcast(new_side)
        cands = _touching_new_pairs(
            new_side, capped, ["band", "bucket"]
        ).distinct()
    else:
        # batch × (index ∪ batch) in ONE broadcast join (round 6 —
        # was two joins + union): the flagged union is NARROW, so with
        # the batch broadcast the index side streams under the join
        # with no Exchange, and the touching-new rule emits each pair
        # once. The broadcast hint is BINDING (bypasses the threshold
        # — see incremental_jaccard_pairs); pass broadcast_batch=False
        # for giant batches to shuffle only the batch side into the
        # index bucketing. The != guard drops nonsense self-rows under
        # an id overlap (the overlap's real damage — double-counted
        # cross-pair intersections — is the disjoint-id precondition's
        # to prevent, see above).
        probe = F.broadcast(new_banded) if broadcast_batch else new_banded
        cands = _touching_new_pairs(probe, all_banded, ["band", "bucket"]).distinct()
    grams = index_grams.select("doc_id", "g").unionByName(new_grams.select("doc_id", "g"))
    # broadcast_batch=False means "this batch is too big to broadcast";
    # the candidate set is bounded by the same batch, so the verify
    # stage's binding hints must come off with it
    return _register_cached(
        _verify_jaccard(cands, grams, threshold, broadcast_candidates=broadcast_batch),
        *cached,
    )


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The corpus AFTER near-dup dedup: one representative (min id)
    per connected component — the terminal step that turns the pair
    set into an actual deduplicated dataset. Docs in no pair are their
    own singleton cluster and always survive. Semi-join keeps the
    original row payload without duplicating columns."""
    clusters = dedup_clusters(docs, pairs, id_col=id_col)
    keep = clusters.filter(F.col(id_col) == F.col("cluster")).select(id_col)
    return docs.join(keep, id_col, "semi")


def dedup_survivors_best(
    docs: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware dedup retention: one representative per connected
    component, chosen as the member with the HIGHEST ``score`` (ties →
    lowest id) instead of the arbitrary min-id — the production policy
    (Rae et al. 2021 keep the higher-quality member of a near-dup
    pair; min-id retention throws away a clean original whenever a
    mangled copy got the smaller id). ``score`` is evaluated against
    ``docs``'s columns (e.g. a length, a classifier score). Singleton
    docs always survive.

    Plan: the clusters table (pointer-jumping CC) joins the scored
    docs once; selection is one row_number window partitioned by
    cluster — the same single keyed exchange min-id retention costs,
    so quality-awareness is free at any scale."""
    from pyspark.sql import Window

    clusters = dedup_clusters(docs, pairs, id_col=id_col)
    scored = docs.select(F.col(id_col), score.alias("_score")).join(
        clusters, id_col
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("_score"), F.asc(id_col)
    )
    keep = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col)
    )
    return docs.join(keep, id_col, "semi")


def _free_local_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpoint's storage blocks NOW.

    ``DataFrame.unpersist`` is a no-op for checkpoint blocks (they are
    RDD-level persisted, not cache-manager entries), so reach the
    LogicalRDD's backing RDD through the analyzed plan. Best-effort:
    never fails the caller — but a failure is LOGGED (debug), because
    under Spark Connect or a plan-representation change this private
    py4j path silently stops freeing blocks and up to max_iter label
    tables would accumulate in executor storage
    (tests/test_skew_and_clusters.py asserts storage stays bounded on
    the deep-chain graph, so a regression is visible). ONLY call on
    checkpoints nothing will read again — a freed localCheckpoint
    cannot be recomputed (its lineage was truncated)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:  # pragma: no cover - depends on backend
        _LOG.debug("localCheckpoint unpersist path unavailable: %r", exc)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 15,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster)
    where cluster = min doc_id reachable. Precondition (every caller's
    construction): pair endpoints are ``docs`` ids — pairs come from a
    screen OVER docs, so a foreign id cannot occur. Iterative label
    propagation
    with pointer jumping: each round does (a) label ← min(label,
    neighbors' labels), then (b) label ← label(label) — the classic
    Shiloach-Vishkin-style shortcut that makes label distance double
    per round, so convergence is O(log diameter) rounds, not
    O(diameter). Near-dup clusters are tiny cliques (1-2 rounds); the
    log bound is what protects chain-shaped clusters. Each round is
    two joins + one aggregation; nothing is collected to the driver.

    Lineage control: ``edges`` (whose upstream may be the whole
    LSH/minhash pipeline) is localCheckpoint-ed once, and each round's
    labels are localCheckpoint-ed before the convergence probe — so
    round k never re-executes rounds 0..k-1 and the plan depth stays
    constant regardless of graph diameter. ``localCheckpoint`` is
    executor-local (re-run the job on executor loss, no reliable-store
    round-trip) — the right tradeoff for a convergent iteration.

    Round 12 (optimization, guide §2.3 shuffle fewer bytes): the
    iteration runs over EDGE NODES only — docs that appear in no pair
    keep label = own id by definition (no neighbor can lower it, and
    no edge node can ever read it: neighbor minima join through
    ``edges.dst`` and the jump lookup only resolves labels that are
    reachable node ids, i.e. edge nodes), so carrying the whole
    corpus through every round's two joins + checkpoint was pure
    overhead. At 100 TB this is the difference between per-round
    state sized by the near-dup population (pairs are a screened,
    verified subset) and per-round state sized by the corpus. The
    isolated docs rejoin once at the end (left join + coalesce to own
    id — same output, law-tested in test_skew_and_clusters).

    Round 13 (optimization, guide §2.4/§5 — fewer driver-sequential
    jobs): the edge checkpoint is LAZY (the labels job computes every
    edge partition through its distinct, materializing the blocks as
    it goes), and each round's checkpoint is lazy too with the
    convergence probe riding the SAME job — the probe aggregates
    ``max(_chg)`` over the new label table, which computes (and
    thereby checkpoints) every partition in one job instead of the
    eager-checkpoint-then-probe two. Per call that is 1 + rounds jobs
    where the round-12 form ran 2 + 2·rounds. Values are untouched:
    the fixpoint iteration, join keys and label arithmetic are
    identical — only job boundaries moved."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("node"))  # both directions present
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        lab = labels.select("node", "label")
        propagated = lab.join(
            neighbor_min, lab.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
        )
        # pointer jump: label ← label(label). Labels are node ids, so
        # self-join on (label == node); left+coalesce guards nodes
        # whose label isn't in docs (can't happen, but cheap safety).
        lookup = propagated.select(
            F.col("node").alias("label"), F.col("label").alias("jump")
        )
        # the convergence flag RIDES the round's checkpoint (round 12
        # optimization, guide §2.4): _chg is computed inline so no
        # second label join is needed to ask "did anything move?".
        # Round 13: the checkpoint is LAZY and the probe is the
        # aggregate that materializes it — max(_chg) computes every
        # partition (checkpointing them as a side effect of the scan)
        # and answers convergence in the SAME job, where the eager
        # checkpoint + filter/limit/count probe was two sequential
        # jobs per round.
        new_labels = (
            propagated.join(lookup, "label", "left")
            .select(
                "node",
                F.coalesce(F.col("jump"), F.col("label")).alias("label"),
                (F.coalesce(F.col("jump"), F.col("label")) != F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.max("_chg")).collect()[0][0]
        # the superseded round's checkpoint blocks are no longer
        # referenced (new_labels is already materialized) — free them
        # now instead of waiting for JVM GC; otherwise up to max_iter
        # full label-table copies coexist in executor storage
        _free_local_checkpoint(labels)
        labels = new_labels
        # max over booleans: True iff any label moved; None on an
        # empty label table (no pairs) — both falsy forms stop
        if not changed:
            break
    _free_local_checkpoint(edges)
    # isolated docs (no pair) never entered the iteration — their
    # cluster is their own id; edge nodes read the converged label
    out = (
        docs.select(F.col(id_col))
        .join(
            labels.select(F.col("node").alias(id_col), "label"),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("label"), F.col(id_col)).alias("cluster"),
        )
    )
    # the result rides (a) any persisted intermediates of the pairs
    # pipeline that produced our input, and (b) the final round's
    # localCheckpoint storage — so a long-lived session (the test
    # suite, the streaming curator) can release everything through the
    # standard release_intermediates(result) call. NOTE the checkpoint
    # caveat in release_intermediates' docstring: after release this
    # result is single-use (its lineage was truncated at the freed
    # checkpoint), unlike plain persisted intermediates.
    return _register_cached(
        out, _LocalCheckpointHandle(labels), *getattr(pairs, "_pwp_cached", ())
    )


class _LocalCheckpointHandle:
    """Adapter exposing a localCheckpoint's storage to
    ``release_intermediates`` (which calls ``.unpersist()`` on every
    riding handle)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def unpersist(self) -> None:
        _free_local_checkpoint(self._df)


def _sig_from_votes(votes: np.ndarray) -> int:
    """(64,) vote tally → signed 64-bit SimHash (bit i set iff votes[i]>0)."""
    sig = 0
    for i in np.nonzero(votes > 0)[0]:
        sig |= 1 << int(i)
    if sig >= 1 << 63:  # reinterpret as signed 64-bit for LongType
        sig -= 1 << 64
    return sig


def _simhash_token_hash(hash_fn: str) -> Column:
    """Per-token hash column for the simhash vote kernel. ``xxhash64``
    (default — fastest, JVM-native) or ``md5_60`` (60-bit md5 prefix
    via the engine-portable conv form: top 4 sig bits become constant
    0, every other bit is reproducible in DuckDB — what turns the
    simhash family hash-checkable)."""
    if hash_fn == "xxhash64":
        return F.xxhash64("t").alias("h")
    if hash_fn == "md5_60":
        return (
            F.conv(F.substring(F.md5(F.concat(F.col("t"), F.lit(":sh"))), 1, 15), 16, 10)
            .cast("long")
            .alias("h")
        )
    raise ValueError(f"unknown simhash hash_fn {hash_fn!r} (xxhash64|md5_60)")


def simhash64(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    hash(token). Tokens hashed JVM-side; the 64 bit-tallies run as
    one vectorized numpy kernel per Arrow batch over range-
    partitioned, doc-sorted tokens with cross-batch carry (the same
    shape as the minhash kernel above — ``np.add.reduceat`` over doc
    boundaries instead of one Python call per document, which costs
    doc-count × group overhead). ``hash_fn="md5_60"`` swaps in the
    engine-portable 60-bit token hash — SAME kernel, hash-checkable
    signatures (see ``dedup_simhash_checked``)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("t"),
    ).select("doc_id", _simhash_token_hash(hash_fn))

    shifts = np.arange(64, dtype=np.uint64)

    def kernel(batches):
        carry_doc = None
        carry_votes = None
        for pdf in batches:
            if pdf.empty:
                continue
            d = pdf["doc_id"].to_numpy()
            h = pdf["h"].to_numpy(dtype=np.uint64)
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            votes = 2 * bits - 1  # (n, 64) in {-1, +1}
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            sums = np.add.reduceat(votes, starts, axis=0)  # (n_docs, 64)
            doc_ids = d[starts]
            if carry_doc is not None:
                if doc_ids[0] == carry_doc:
                    sums[0] += carry_votes
                else:
                    yield pd.DataFrame(
                        {"doc_id": [carry_doc], "simhash": [_sig_from_votes(carry_votes)]}
                    )
            carry_doc = int(doc_ids[-1])
            carry_votes = sums[-1]
            if len(doc_ids) > 1:
                yield pd.DataFrame(
                    {
                        "doc_id": doc_ids[:-1],
                        "simhash": [_sig_from_votes(s) for s in sums[:-1]],
                    }
                )
        if carry_doc is not None:
            yield pd.DataFrame(
                {"doc_id": [carry_doc], "simhash": [_sig_from_votes(carry_votes)]}
            )

    sorted_toks = toks.repartitionByRange("doc_id").sortWithinPartitions("doc_id")
    return sorted_toks.mapInPandas(kernel, schema="doc_id long, simhash long")


def simhash64_grouped(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Reference implementation: one ``applyInPandas`` group call per
    document. Kept for the equality test against the kernel form —
    identical results, ~doc-count × group-overhead slower."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("t"),
    ).select("doc_id", _simhash_token_hash(hash_fn))

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf["doc_id"].iloc[0]
        h = pdf["h"].to_numpy(dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        return pd.DataFrame({"doc_id": [doc], "simhash": [_sig_from_votes(votes)]})

    return toks.groupBy("doc_id").applyInPandas(_fold, schema="doc_id long, simhash long")


def _safe_norm(M: np.ndarray) -> np.ndarray:
    """Row L2 norms with zero mapped to 1, so an all-zero embedding
    yields cosine 0 against everything (and produces NO NaNs that
    would silently drop pairs) instead of 0/0. The DuckDB oracle
    mirrors this with NULLIF(norm, 0) + COALESCE."""
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    return np.where(nrm == 0, 1.0, nrm)


def embedding_cosine_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup GROUND TRUTH: every pair (id_a <
    id_b) with round(cosine, ``round_to``) ≥ threshold.

    All-pairs by construction — the oracle/recall baseline, same
    contract as ``brute_force_topk``: one side is collected and
    broadcast (corpus must fit in executor memory), each partition's
    block runs ONE numpy matmul against it, and the (n²) similarity
    matrix never shuffles — only qualifying pairs leave the kernel.
    The production near-dup path is :func:`embedding_cosine_pairs_lsh`.
    Threshold compares the ROUNDED cosine so engine/oracle float
    summation-order differences (BLAS vs sequential) cannot flip a
    boundary pair."""
    pdf = emb.select(id_col, vec_col).toPandas()
    all_ids = pdf[id_col].to_numpy().astype(np.int64)
    M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    M /= _safe_norm(M)

    def kernel(batches):
        for b in batches:
            if b.empty:
                continue
            ids = b[id_col].to_numpy().astype(np.int64)
            B = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            B /= _safe_norm(B)
            sims = np.round(B @ M.T, round_to)  # (b, N)
            li, ri = np.nonzero((sims >= threshold) & (ids[:, None] < all_ids[None, :]))
            if len(li):
                yield pd.DataFrame(
                    {"id_a": ids[li], "id_b": all_ids[ri], "cosine": sims[li, ri]}
                )

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="id_a long, id_b long, cosine double"
    )


def embedding_cosine_pairs_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: random-hyperplane LSH
    blocking (Charikar 2002) — pairs must collide in ≥1 of
    ``num_tables`` sign-pattern buckets before the exact cosine is
    ever computed; the all-pairs comparison never happens. Per-table
    collision prob for similarity s is (1 - arccos(s)/π)^planes, so
    the defaults give ~93% recall at s=0.9 — the near-dup regime this
    targets (recall collapses at low thresholds by design; use the
    exact form as ground truth there)."""
    from .similarity import hyperplane_signatures_multi

    # all tables in ONE scan + ONE Python stage (was num_tables
    # separate mapInPandas stages unioned — 8× the per-stage overhead
    # for identical buckets); persisted because the self-join consumes
    # it on both sides
    allsig = hyperplane_signatures_multi(
        emb, dim, num_planes, num_tables, seed, id_col, vec_col
    ).persist()
    a = allsig.alias("a")
    b = allsig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
        # round 13 (guide §2.2/§2.5): candidate rows are 16 bytes but
        # each becomes ~16·dim bytes of attached vectors + a dim-length
        # fold in the verify — AQE's byte-based coalescing (and a
        # single-partition signature cache on unsplittable local input)
        # would run the verify nearly serially. One cheap id-only
        # exchange sizes the verify stage by the session's parallelism
        # at ANY scale; values are unchanged (pure repartition).
        .repartition(allsig.sparkSession.sparkContext.defaultParallelism)
    )
    # norms are per-VECTOR, not per-pair: compute each once in the
    # (broadcastable) vector table instead of re-folding two
    # transform+aggregate traversals for every candidate pair — the
    # re-score is the dominant cost at low thresholds where LSH prunes
    # little, and this cuts its array traversals 3x. The arithmetic is
    # unchanged (same sqrt-of-fold per vector, same dot/(na*nb)
    # division), so results are bit-identical to the per-pair form.
    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    vecs = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nv", nrm(F.col("v")))
    va = vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("ea"), F.col("nv").alias("na"))
    vb = vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("eb"), F.col("nv").alias("nb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    # nullif guard: a zero-norm vector lands in bucket 0 of every
    # table (all sign bits false) but has NO defined cosine — 0/0
    # would be NaN, and Spark orders NaN above every number, so the
    # threshold filter would pass. NULL fails ">=" in both engines,
    # matching semantic_dedup's stated convention (zero-norm vectors
    # are never marked duplicates).
    return _register_cached(
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            F.round(dot / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)), round_to),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine"),
        allsig,
    )


def build_embedding_index(
    emb: DataFrame,
    dim: int,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(vecs, sigs) — the two tables to materialize for incremental
    embedding-cosine dedup (the embedding sibling of
    ``build_minhash_index``):

    - ``vecs`` (vec_id, v, nv): float64 vectors with their norm
      precomputed ONCE (the verify side re-scores candidates and must
      never re-fold a norm per pair);
    - ``sigs`` (vec_id, tbl, bucket): hyperplane sign-pattern buckets
      for all tables in one pass (Charikar 2002), deterministic in
      (seed, vector) — index rows computed in past batches stay
      bit-identical to a fresh run, the property the incremental ==
      batch equality test pins.
    """
    from .similarity import hyperplane_signatures_multi

    nrm = lambda c: F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))  # noqa: E731
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nv", nrm(F.col("v")))
    sigs = hyperplane_signatures_multi(
        emb, dim, num_planes, num_tables, seed, id_col, vec_col
    )
    return vecs, sigs


def write_embedding_index(
    vecs: DataFrame,
    sigs: DataFrame,
    prefix: str,
    n_buckets: int = 32,
    path_prefix: str | None = None,
) -> None:
    """Materialize the embedding-dedup index as two bucketed tables:

    - ``{prefix}_sig`` (vec_id, tbl, bucket) bucketed by (tbl,
      bucket) — the candidate-probe side: a batch screen joins it on
      exactly those keys, so the corpus side needs no Exchange;
    - ``{prefix}_vec`` (vec_id, v, nv) bucketed by vec_id — the
      verify side, restricted by candidate ids before any scoring.

    Appending an accepted batch = appending its vec and sig rows
    (both deterministic in (seed, vector))."""
    from .bucketing import write_bucketed

    write_bucketed(
        vecs,
        f"{prefix}_vec",
        ["vec_id"],
        n_buckets=n_buckets,
        path=None if path_prefix is None else f"{path_prefix}_vec",
    )
    write_bucketed(
        sigs,
        f"{prefix}_sig",
        ["tbl", "bucket"],
        n_buckets=n_buckets,
        path=None if path_prefix is None else f"{path_prefix}_sig",
    )


def read_embedding_index(spark, prefix: str) -> tuple[DataFrame, DataFrame]:
    """(vecs, sigs) handles onto a ``write_embedding_index`` layout."""
    return spark.table(f"{prefix}_vec"), spark.table(f"{prefix}_sig")


def incremental_embedding_pairs(
    index_vecs: DataFrame,
    index_sigs: DataFrame,
    new_emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    broadcast_batch: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup screen of a new batch against an
    indexed corpus — the 100 TB crawl-loop shape for embedded corpora:
    only the BATCH is signed; the corpus contributes pre-computed
    (sig, vec+norm) index rows; candidates arise from hyperplane
    bucket collisions (new vs all) and the exact cosine verifies
    candidates only. Equals ``embedding_cosine_pairs_lsh`` on
    corpus ∪ batch restricted to pairs touching ≥1 new vector (same
    seed/geometry) — the equality the test suite asserts, bitwise,
    because the verify arithmetic (fold dot / precomputed norms) is
    identical.

    Candidates = (batch × index) ∪ (batch × batch): the index is never
    unioned under the join, so a ``write_embedding_index`` layout
    feeds the probe with NO Exchange above its scan (batch broadcast;
    pass ``broadcast_batch=False`` for giant batches — the BINDING
    hint caveat of ``incremental_minhash_pairs`` applies). The verify
    side touches only candidate ids (broadcast semi-join restriction),
    so per-batch verify cost scales with collisions, not the corpus.

    ``max_bucket_size`` drops oversized (tbl, bucket) groups —
    counted over index ∪ batch, the same union-scan cost caveat as
    ``incremental_minhash_pairs`` — bounding the f² candidate blow-up
    a viral near-identical cluster (or a degenerate all-zeros region)
    creates. Sizing note: buckets stay O(1) only while
    ``num_planes ≳ log2(corpus)``; with too few planes EVERY bucket
    is oversized and capping would drop real pairs — raise the plane
    count, don't cap, in that regime.

    Precondition: batch ids are disjoint from the indexed corpus.
    """
    from .similarity import hyperplane_signatures_multi

    new_sigs = hyperplane_signatures_multi(
        new_emb, dim, num_planes, num_tables, seed, id_col, vec_col
    ).persist()
    cached = [new_sigs]
    if max_bucket_size is not None:
        all_sigs = (
            index_sigs.withColumn("is_new", F.lit(False))
            .unionByName(new_sigs.withColumn("is_new", F.lit(True)))
            .persist()
        )
        cached.append(all_sigs)
        all_sigs = _cap_groups(all_sigs, ["tbl", "bucket"], max_bucket_size)
        new_side = all_sigs.filter(F.col("is_new"))
        if broadcast_batch:
            new_side = F.broadcast(new_side)
        cands = (
            _touching_new_pairs(
                new_side.withColumnRenamed("vec_id", "doc_id"),
                all_sigs.withColumnRenamed("vec_id", "doc_id"),
                ["tbl", "bucket"],
            )
            .distinct()
            .persist()
        )
    else:
        probe = F.broadcast(new_sigs) if broadcast_batch else new_sigs
        xi = (
            index_sigs.alias("b")
            .join(
                probe.alias("a"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") != F.col("b.vec_id")),
            )
            .select(
                F.least("a.vec_id", "b.vec_id").alias("id_a"),
                F.greatest("a.vec_id", "b.vec_id").alias("id_b"),
            )
        )
        nn = (
            new_sigs.alias("a")
            .join(
                new_sigs.alias("b"),
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        )
        cands = xi.unionByName(nn).distinct().persist()

    new_vecs, _ = build_embedding_index(
        new_emb, dim, num_planes, num_tables, seed, id_col, vec_col
    )
    ids = (
        cands.select(F.col("id_a").alias("vec_id"))
        .unionByName(cands.select(F.col("id_b").alias("vec_id")))
        .distinct()
    )
    vecs = (
        index_vecs.select("vec_id", "v", "nv")
        .unionByName(new_vecs)
        .join(F.broadcast(ids), "vec_id", "semi")
    )
    va = vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("ea"), F.col("nv").alias("na"))
    vb = vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("eb"), F.col("nv").alias("nb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    # same nullif guard as embedding_cosine_pairs_lsh (and for the
    # same reason): zero-norm vectors collide in bucket 0 everywhere,
    # 0/0 = NaN sorts ABOVE the threshold in Spark — NULL instead, so
    # they are never emitted as duplicates (keeps the bitwise
    # incremental == batch equality).
    result = (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            F.round(dot / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)), round_to),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    return _register_cached(result, *cached, cands)


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — JVM-side via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, sig_partitions: int | None = None, **kw
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit quarters (a pair
    within hamming ≤ 3 of 64 bits must agree on ≥1 of 4 quarters —
    pigeonhole), then verify hamming distance. Never all-pairs.

    The signature table is persisted (round 13, guide §2.4/§5): both
    sides of the quarter self-join consume it, and without the persist
    the tokenize→hash→vote-kernel subtree executes once PER SIDE (the
    static ReuseExchange only covers up to the range exchange — the
    sort + Arrow kernel + quarter explode re-run). 16 bytes/doc of
    state, released via release_intermediates. ``sig_partitions``
    re-packs the cached table to size-based partitions (guide §2.2 —
    callers with catalog row counts pass ceil(n·16B / 32MB); default
    keeps the kernel's partitioning)."""
    sigs = simhash64(docs, **kw)
    if sig_partitions is not None:
        sigs = sigs.repartition(sig_partitions, "doc_id")
    sigs = sigs.persist()
    quarters = _simhash_quarters(sigs)
    a = quarters.alias("a")
    b = quarters.alias("b")
    return _register_cached(
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qv") == F.col("b.qv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming),
        sigs,
    )


def _simhash_quarters(sigs: DataFrame) -> DataFrame:
    """(doc_id, simhash) → (doc_id, simhash, q, qv): the 4 pigeonhole
    16-bit blocks (a pair within hamming ≤ 3 of 64 bits must agree on
    ≥ 1 of 4 disjoint blocks — Manku et al. 2007's table scheme at
    t = 4)."""
    return sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * q).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for q in range(4)
                ]
            )
        ).alias("q", "qv"),
    )


def incremental_simhash_pairs(
    index_sigs: DataFrame | None,
    batch: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental SimHash near-dup screen: pairs TOUCHING the new
    batch — (batch × stored index) ∪ (batch × batch) — against a
    stored ``(doc_id, simhash)`` signature table, without ever
    recomputing or rescanning the corpus's signatures (8 bytes/doc of
    state; the cheapest stored dedup index in the engine). The
    incremental sibling of ``incremental_minhash_pairs``, with the
    index maintenance trivial by comparison: new accepted signatures
    APPEND — there is no banding state or df tier to fold.

    Disjointness contract (same as every incremental screen): batch
    ids must not collide with index ids. Candidates come from the
    batch side's quarter blocks probing index ∪ batch blocks, so
    every emitted pair includes ≥ 1 batch doc by construction;
    index × index pairs are structurally impossible. Verification is
    the exact popcount, so candidates never inflate results — law
    tested: incremental(index, batch) == full-corpus pairs restricted
    to those touching the batch.

    With ``hash_fn="md5_60"`` the whole screen is engine-portable and
    hash-checked end-to-end (``dedup_incremental_simhash``).

    ``batch_sigs`` (round 13, guide §2.4) lets a caller that already
    holds the batch's signatures pass them instead of ``batch``; the
    batch signature subtree is otherwise referenced TWICE (probe side
    + the union side), so the internally-computed form persists it —
    one tokenize→vote-kernel pass, 16 bytes/doc, released via
    release_intermediates."""
    handles: list[DataFrame] = []
    if batch_sigs is not None:
        bsigs = batch_sigs.select("doc_id", "simhash")
    else:
        bsigs = simhash64(batch, text_col, id_col, hash_fn=hash_fn).persist()
        handles.append(bsigs)
    all_sigs = (
        index_sigs.select("doc_id", "simhash").unionByName(bsigs)
        if index_sigs is not None
        else bsigs
    )
    probe = _simhash_quarters(bsigs).alias("a")
    side = _simhash_quarters(all_sigs).alias("b")
    return _register_cached(
        probe.join(
            side,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qv") == F.col("b.qv"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming),
        *handles,
    )


def ngram_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """DIRECTED n-gram containment |A∩B| / |A| — the asymmetric
    near-dup relation Jaccard misses: a short document quoted whole
    inside a long one has low Jaccard (the union is big) but
    containment ≈ 1 for the short side. Lee et al. 2021 §4 treat
    these quote-inclusion cases as duplication; this is the exact
    screen for them. Always ≥ Jaccard for the contained side.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (shared
    xxhash64 shingle join, optional stop-shingle cap — mandatory at
    scale), with BOTH directions emitted from the one undirected
    intersection table: (id_src, id_dst, containment) means id_src's
    shingle set is ≥ threshold contained in id_dst's.
    """
    from pyspark.sql import Window

    # same shared-exchange boundary + round-13 refinements as
    # ngram_jaccard_pairs (uniform isnotnull guard, window sizes,
    # count("doc_id") in the cap — see there); the containment
    # divisions are unchanged (same ints)
    grams = (
        exploded_ngrams(docs, text_col, id_col, n)
        .select("doc_id", F.xxhash64("g").alias("g"))
        .where(F.col("doc_id").isNotNull())
        .repartition("doc_id")
    )
    if max_shingle_freq is not None:
        common = (
            grams.groupBy("g").agg(F.count("doc_id").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("g")
        )
        grams = grams.join(F.broadcast(common), "g", "anti")
    sized = grams.select(
        "doc_id",
        "g",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id"))
        .alias("n_grams"),
    )
    a = sized.alias("a")
    b = sized.alias("b")
    both = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_inter"),
            F.first(F.col("a.n_grams")).alias("na"),
            F.first(F.col("b.n_grams")).alias("nb"),
        )
    )
    # both directions from ONE pass over the pair rows — a self-union
    # would reference (and re-execute) the whole inverted-index
    # subtree twice (measured 14 shuffles vs the Jaccard screen's 7)
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("id_src"),
                    F.col("id_b").alias("id_dst"),
                    (F.col("n_inter").cast("double") / F.col("na")).alias(
                        "containment"
                    ),
                ),
                F.struct(
                    F.col("id_b").alias("id_src"),
                    F.col("id_a").alias("id_dst"),
                    (F.col("n_inter").cast("double") / F.col("nb")).alias(
                        "containment"
                    ),
                ),
            )
        ).alias("p")
    ).select("p.id_src", "p.id_dst", "p.containment")
    return directed.filter(F.col("containment") >= threshold)


# =====================================================================
# Manku multi-rotation Hamming index (round 8 — r7 verdict #5):
# the generalization of the quarter-block scheme to HIGHER radii
# without widening blocks (Manku et al. 2007 §3, "Detecting
# near-duplicates for web crawling" — the sorted-permuted-tables
# construction). Split the 64-bit signature into ``blocks`` disjoint
# blocks; a pair within hamming ≤ ``radius`` leaves at least
# ``blocks - radius`` blocks untouched (pigeonhole), so matching on
# every (blocks - radius)-subset of blocks — one "rotation"/table per
# subset, keyed by those blocks' concatenated bits — finds EVERY such
# pair, and the exact popcount verify keeps precision at 100%.
#
# Why not just widen the quarter scheme? radius 6 with single-block
# match needs 7 blocks of ~9 bits — a 512-value key space whose
# buckets hold corpus/512 docs each (candidate blow-up). The
# multi-rotation form keeps 16-bit keys (blocks=8, match on block
# PAIRS): C(8,2) = 28 tables of 65k-value keys — probe cost bounded
# by table count instead of bucket occupancy. Storage is 28 rows of
# (tbl, key, sig) per doc — still tiny next to gram/banded tiers, and
# the stored form is append-only like the quarter signature index.
# =====================================================================


def _simhash_combos(blocks: int, radius: int) -> list[tuple[int, ...]]:
    from itertools import combinations

    m = blocks - radius
    if m < 1:
        raise ValueError(
            f"radius {radius} needs more than {blocks} blocks (pigeonhole: "
            "at least one block subset must be untouched)"
        )
    if 64 % blocks != 0:
        raise ValueError(f"blocks={blocks} must divide 64")
    return list(combinations(range(blocks), m))


def simhash_rotation_keys(
    sigs: DataFrame, blocks: int = 8, radius: int = 6
) -> DataFrame:
    """(doc_id, simhash, tbl, key) — one row per rotation table: the
    key packs the combination's blocks (extracted with UNSIGNED
    shifts — xxhash64 signatures use the sign bit) into the low bits,
    exactly the top-bits-after-rotation match of Manku's sorted
    tables, expressed as an equi-join key. Pure codegen projection +
    one explode; ``blocks=4, radius=3`` reproduces the quarter
    scheme's candidate set (law-tested)."""
    width = 64 // blocks
    mask = (1 << width) - 1
    combos = _simhash_combos(blocks, radius)
    # the whole 28-entry array is ONE parsed SQL string: building it
    # as per-term Column objects costs ~10 py4j round-trips per combo
    # per call site in plan-BUILD time (round 13; the r12 "wide
    # literal expressions" lesson). Same expressions, same values:
    # key = Σ_pos ((simhash >>> width·bi) & mask) << width·pos as
    # BIGINT, tbl as INT.
    def _key_sql(combo: tuple[int, ...]) -> str:
        terms = []
        for pos, bi in enumerate(combo):
            blk = f"(shiftrightunsigned(simhash, {width * bi}) & CAST({mask} AS BIGINT))"
            terms.append(blk if pos == 0 else f"shiftleft({blk}, {width * pos})")
        return "(CAST(0 AS BIGINT) + " + " + ".join(terms) + ")"

    entries = ", ".join(
        f"struct(CAST({t} AS INT) AS tbl, {_key_sql(combo)} AS key)"
        for t, combo in enumerate(combos)
    )
    return sigs.select(
        "doc_id", "simhash", F.expr(f"explode(array({entries}))").alias("e")
    ).select("doc_id", "simhash", F.col("e.tbl").alias("tbl"), F.col("e.key").alias("key"))


def incremental_simhash_pairs_rotated(
    index_keys: DataFrame | None,
    batch: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks: int = 8,
    radius: int = 6,
    hash_fn: str = "xxhash64",
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental SimHash screen at radius > 3: batch rotation keys
    probe (stored ∪ batch) rotation keys on (tbl, key); the exact
    popcount verifies candidates, so the result EQUALS the brute-force
    hamming ≤ radius pair set restricted to pairs touching the batch
    (coverage is the pigeonhole argument, not probability — law
    tested). ``index_keys`` is the append-only
    :func:`simhash_rotation_keys` table of all accepted signatures
    (28·8 bytes/doc at the defaults); pass None for a first batch.
    With ``hash_fn="md5_60"`` the whole screen is engine-portable —
    ``dedup_simhash_rotated`` rebuilds the rotations, neighborhoods
    and verdicts in DuckDB.

    ``batch_sigs`` (round 13, guide §2.4) lets a caller that already
    materialized the batch's (doc_id, simhash) table skip the
    signature kernel here; the internally-computed form persists its
    own — the batch rotation keys are consumed by BOTH join sides
    (probe + the union side), so without a materialization point the
    tokenize→vote-kernel subtree executes twice per run."""
    handles: list[DataFrame] = []
    if batch_sigs is not None:
        bsigs = batch_sigs.select("doc_id", "simhash")
    else:
        bsigs = simhash64(batch, text_col, id_col, hash_fn=hash_fn).persist()
        handles.append(bsigs)
    bkeys = simhash_rotation_keys(bsigs, blocks=blocks, radius=radius)
    side = (
        index_keys.select("doc_id", "simhash", "tbl", "key").unionByName(bkeys)
        if index_keys is not None
        else bkeys
    )
    a, b = bkeys.alias("a"), side.alias("b")
    return _register_cached(
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= radius),
        *handles,
    )
