"""Training-data curation operators: deterministic splits, per-domain
quotas, benchmark-contamination checks, sequence packing.

These are the corpus-management steps between "raw documents" and
"training batches" that the dedup/quality/similarity families feed
(SURVEY §2 LLM-pipeline surface; same role as the reference's
materialized per-key views, but over a document corpus):

- **train_val_test_split** — membership must be a pure function of a
  stable document key, never of sampling order or partitioning, so
  re-runs and late-arriving shards land in the same split. Bucket =
  integer prefix of md5(key) — cheap, uniform, and portable (the
  DuckDB oracle reproduces it bit-for-bit).
- **domain_topk** — per-domain quotas via a ranked window; caps any
  one source's dominance before training. One shuffle on the domain
  key; at 100 TB a skewed domain degrades like any keyed window
  (AQE/salting upstream), and rank-k cutoff means only k rows per
  domain survive the stage.
- **benchmark_contamination** — n-gram-overlap screen of the corpus
  against an eval/benchmark set (the decontamination step every
  public LLM data pipeline runs; see GPT-2/GPT-3 reports). Inverted-
  index equi-join on the shingle — never corpus × benchmark — with
  the benchmark side orders of magnitude smaller (broadcastable).
- **pack_sequences** — greedy first-fit packing of documents into
  fixed token-capacity sequences (context windows), deterministic in
  (group, order): the classic "sequence packing" preprocessing that
  turns ragged documents into dense training batches. Packing is a
  sequential fold per group, so it runs as one vectorized pass per
  group partition (``applyInPandas``); groups (domains, shards) are
  the parallelism unit, exactly like the fold's rooms.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import exploded_ngrams, tokens


def _md5_bucket(key_col: str, buckets: int, salt: str = ""):
    """THE membership-hash contract shared by every deterministic
    assignment here (split, mixing): first 8 hex digits of
    md5(key‖salt) as an integer, mod ``buckets``. One definition so
    engine code and the DuckDB oracles that reproduce it bit-for-bit
    can never drift apart per-operator."""
    key = F.col(key_col).cast("string")
    if salt:
        key = F.concat(key, F.lit(salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % buckets


def split_assignment(
    key_col: str = "doc_id",
    train: int = 80,
    val: int = 10,
    buckets: int = 100,
):
    """Column expr: deterministic split label from a stable key.

    bucket = :func:`_md5_bucket`; label = train / val / test by
    threshold. Pure function of the key — stable across runs,
    partitionings, and engines (the oracle mirrors it exactly).
    """
    bucket = _md5_bucket(key_col, buckets)
    return (
        F.when(bucket < train, F.lit("train"))
        .when(bucket < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def train_val_test_split(
    docs: DataFrame, key_col: str = "doc_id", train: int = 80, val: int = 10
) -> DataFrame:
    """(key, split) for every document — see :func:`split_assignment`."""
    return docs.select(
        F.col(key_col),
        split_assignment(key_col, train, val).alias("split"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """(doc_id, cluster, split): train/val/test assignment keyed by the
    near-dup CLUSTER, not the document.

    A per-document hash split leaks: two near-duplicate documents can
    land on opposite sides of the train/test boundary, and the model
    is then evaluated on (near-)training data. Splitting on the
    connected-component representative puts every member of a near-dup
    cluster on the SAME side — the split is leakage-free by
    construction while remaining a pure function of content
    (deterministic across runs and engines).

    Plan: pairs → ``dedup_clusters`` (pointer-jumping label
    propagation, O(log diameter) rounds) → scalar md5 projection on
    the cluster id. Singleton docs are their own cluster, so coverage
    is total.
    """
    from .dedup import _register_cached, dedup_clusters

    clusters = dedup_clusters(docs, pairs, id_col=id_col)
    out = clusters.select(
        F.col(id_col),
        "cluster",
        split_assignment("cluster", train, val).alias("split"),
    )
    # .select() drops the riding release handles — re-attach them so
    # release_intermediates(result) frees the clustering's storage
    return _register_cached(out, *getattr(clusters, "_pwp_cached", ()))


def domain_topk(
    docs: DataFrame,
    group_col: str = "source",
    score_col: str = "n_chars",
    k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per domain by score (ties → lowest id wins),
    the per-source quota cap. Ranked window per domain: one shuffle,
    k survivors per group."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("rank_in_domain", F.row_number().over(w))
        .filter(F.col("rank_in_domain") <= k)
        .select(id_col, group_col, score_col, "rank_in_domain")
    )


def token_budget_quota(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    score_col: str = "n_chars",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-domain TOKEN-budget selection (the mixing-recipe primitive
    when quotas are token counts, not document counts): walk each
    domain best-score-first (ties → lowest id) and keep documents
    while the running token total stays ≤ ``budget`` — the first
    overflowing document and everything after it are dropped.

    ``tokens_col`` names a precomputed token-count column; when None,
    whitespace tokens of ``text`` are counted inline (JVM split, no
    Python). One shuffle on the domain key; the running sum is a rank
    window over the domain partition — the same single exchange as
    ``domain_topk``. Greedy prefix-by-budget (not knapsack): selection
    is deterministic and order-stable, which is what reproducible
    corpus recipes need."""
    from pyspark.sql import Window

    if tokens_col is None:
        from .textops import token_count

        docs = docs.withColumn("_toks", token_count("text"))
        tokens_col = "_toks"
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_tokens", F.sum(tokens_col).over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .select(
            id_col,
            group_col,
            F.col(tokens_col).cast("bigint").alias("n_tokens"),
            "cum_tokens",
        )
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    min_overlap: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: the benchmark document sharing the largest
    fraction of its distinct word n-grams, if that fraction reaches
    ``min_overlap``.

    overlap(c, b) = |grams(c) ∩ grams(b)| / |grams(c)| — containment
    of the corpus doc in the benchmark doc's shingle set (Broder 1997
    containment, the decontamination screen's standard measure).

    Scale shape: DISTINCT shingle inverted index on each side, equi-
    join on the shingle string (at 100 TB: xxhash64 the shingle to a
    long first — same plan, narrower key), partial-agg counts per
    (corpus, benchmark) pair, then one max_by per corpus doc. The
    benchmark side is small by nature — Spark broadcasts it; corpus
    shingles stream past it without a corpus-side shuffle.
    """
    # exploded_ngrams dedups per doc (array_distinct before explode),
    # so (doc_id, g) is already unique — no distinct-shuffle needed
    cg = exploded_ngrams(corpus, text_col, id_col, n)
    bg = exploded_ngrams(benchmark, text_col, id_col, n).withColumnRenamed(
        "doc_id", "bench_id"
    )
    sizes = cg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        cg.join(F.broadcast(bg), "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        hits.join(sizes, "doc_id")
        .withColumn(
            "overlap",
            F.round(F.col("n_shared").cast("double") / F.col("n_grams"), 6),
        )
        .filter(F.col("overlap") >= min_overlap)
        .groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct(F.col("bench_id"), F.col("n_shared"), F.col("overlap")),
                # max overlap; ties -> LOWEST bench_id (negate for max_by)
                F.struct(F.col("overlap"), (-F.col("bench_id")).alias("_neg")),
            ).alias("_top")
        )
        .select(
            "doc_id",
            F.col("_top.bench_id").alias("bench_id"),
            F.col("_top.n_shared").alias("n_shared"),
            F.col("_top.overlap").alias("overlap"),
        )
    )


def weighted_domain_sample(
    docs: DataFrame,
    rates: dict[str, float] | DataFrame,
    default_rate: float = 1.0,
    key_col: str = "doc_id",
    group_col: str = "source",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic stratified sampling by domain — the data-mixing
    step that reweights sources toward a target distribution (as in
    the public Pile / DoReMi recipes): keep a ``rates[domain]``
    fraction of each domain's documents.

    Membership = md5-prefix bucket of the DOCUMENT KEY (salted with
    ':mix' so it is independent of the train/val/test split hash)
    below the domain's rate threshold — a pure function of
    (key, rate), so the sample is reproducible across runs/
    partitionings, monotone in the rate (raising a rate only ADDS
    documents), and needs no RNG state. Plan: scalar projection +
    filter on the scan, zero shuffles (unlike ``DataFrame.sampleBy``,
    which is seeded per-partition and not stable under
    repartitioning).

    ``rates`` is a plain dict for a handful of domains (compiled to a
    CASE expression) or a ``(group_col, rate)`` DataFrame for many —
    the DataFrame form broadcast-joins, so a million-domain rate table
    never becomes a million-branch expression.

    The threshold is ``round(rate · buckets)`` — rounded, not
    truncated, because e.g. 0.3·10⁶ is 299999.99999999994 in doubles
    and a truncating cast would silently exclude the boundary bucket
    (DuckDB's CAST rounds, so truncation would also desync the
    oracle)."""
    bucket = _md5_bucket(key_col, buckets, salt=":mix")

    def thresh(rate_col):
        return F.round(rate_col * buckets, 0).cast("bigint")

    if isinstance(rates, DataFrame):
        rated = docs.join(F.broadcast(rates), group_col, "left").withColumn(
            "_rate", F.coalesce(F.col("rate"), F.lit(default_rate))
        )
        return rated.filter(bucket < thresh(F.col("_rate"))).drop("rate", "_rate")
    rate = F.lit(default_rate)
    for dom, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == dom, F.lit(float(r))).otherwise(rate)
    return docs.filter(bucket < thresh(rate))


def chunk_doc_spans(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the doc→chunk explosion
    that feeds embedding/indexing pipelines (chunk size with a
    smaller stride = overlapping context windows).

    Emits (doc_id, chunk_id, tok_start, tok_end) spans with
    tok_start = chunk_id·stride, covering every token; the final
    chunk is the only short one, and a document shorter than one
    chunk yields exactly one chunk. (Slice the text by span downstream
    — keeping the output scalar keeps it oracle-hashable and cheap.)
    Requires ``0 < stride <= chunk_tokens`` — a larger stride would
    silently leave gaps between chunks. Pure JVM array expressions
    (sequence → transform → explode on the materialized token
    array): the per-row fan-out is (n_tokens-chunk)/stride + 1 rows
    with NO shuffle — a narrow flatMap in the scan stage, which is
    the shape that survives corpus scale."""
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"chunk_doc_spans: need 0 < stride <= chunk_tokens, got "
            f"stride={stride} chunk_tokens={chunk_tokens}"
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_t")
    )
    n = F.size("_t")
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1,
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_id"),
            (i * stride).cast("bigint").alias("tok_start"),
            F.least(i * stride + chunk_tokens, n).cast("bigint").alias("tok_end"),
        ),
    )
    return toks.select("doc_id", n.cast("bigint").alias("n_tokens"), F.explode(spans).alias("s")).select(
        "doc_id",
        F.col("s.chunk_id").alias("chunk_id"),
        F.col("s.tok_start").alias("tok_start"),
        F.col("s.tok_end").alias("tok_end"),
    )


def pack_sequences(
    docs: DataFrame,
    group_col: str = "source",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = 2048,
    n_shards: int | None = None,
) -> DataFrame:
    """Greedy first-fit sequence packing, deterministic per group.

    Documents are taken in ``order_col`` order within each group; a
    document that would push the running token total past ``capacity``
    starts the next sequence (an oversized document occupies a
    sequence alone). Output adds ``seq_id`` (0-based per group).

    Sequential-by-definition per group (each bin decision depends on
    the previous accumulator — a loop-carried dependency no cumsum
    vectorizes), so each group folds in ONE Arrow-batched
    ``applyInPandas`` call running a per-element Python loop; groups
    are the parallelism unit AND the per-task cost bound. At corpus
    scale a single domain both exceeds task memory and makes the
    Python loop the hot path — pass ``n_shards`` to split each group
    into ``n_shards`` deterministic sub-groups (xxhash64 of the order
    key) packed independently: output gains a ``shard`` column,
    ``seq_id`` is 0-based per (group, shard), and at most
    ``n_shards - 1`` extra partially-filled sequences exist per group
    versus unsharded packing — the standard packing/parallelism
    tradeoff."""
    narrow = docs.select(group_col, order_col, token_col)
    keys = [group_col]
    if n_shards is not None:
        narrow = narrow.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards))
        )
        keys.append("shard")
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in narrow.schema.fields)
        + ", seq_id bigint"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        seq = []
        sid = 0
        acc = 0
        # Bump on overflow for every row but the first — EXACTLY the
        # recursive-CTE statement of the fold (anchor row always opens
        # sequence 0; each later row bumps iff acc + t > capacity).
        # An `if acc and ...` truthiness guard would diverge when the
        # running total is 0: a zero-token document followed by an
        # oversized one must still open a new sequence.
        for i, t in enumerate(toks):
            if i > 0 and acc + t > capacity:
                sid += 1
                acc = 0
            acc += t
            seq.append(sid)
        pdf["seq_id"] = pd.Series(seq, dtype="int64")
        return pdf

    return narrow.groupBy(*keys).applyInPandas(fold, schema=schema)


def shard_assignment(
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "42",
):
    """Column exprs (shard, h) for the deterministic global-shuffle
    shard layout of a training-data export.

    Every large-scale pipeline ends the same way: shuffle the corpus
    globally and write N shards so a data loader can stream any shard
    and see an unbiased sample in random order. Doing that with
    ``ORDER BY rand()`` is a full global sort AND non-reproducible;
    instead both the shard AND the within-shard order derive from
    :func:`_md5_bucket`-style content hashing — a pure function of
    (key, seed), so the export is bit-reproducible across runs,
    engines, and retries, and changing the seed is a fresh shuffle.
    """
    key = F.concat(F.col(key_col).cast("string"), F.lit(":shards:" + seed))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    return (h % n_shards).alias("shard"), h.alias("h")


def shuffle_shards(
    docs: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "42",
) -> DataFrame:
    """(key, shard, pos): the declared-query form of the shard layout
    — pos is the 0-based position of the document within its shard's
    hash-shuffled order (ties on the 32-bit hash break by key)."""
    shard, h = shard_assignment(key_col, n_shards, seed)
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return (
        docs.select(F.col(key_col), shard, h)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .select(key_col, "shard", "pos")
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    key_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "42",
) -> None:
    """Materialize the shuffled export: one ``shard=<i>`` partition
    directory per shard, rows inside each file already in the shard's
    deterministic shuffled order (sortWithinPartitions — no global
    sort anywhere; the only exchange is the hash repartition on the
    shard id). Readers stream a directory and get the reproducible
    random order for free.

    Sizing at scale: each shard is sorted by ONE task, so pick
    ``n_shards`` to make shards file-sized (corpus_bytes / ~256 MB —
    e.g. ~400k shards for 100 TB), which is also what a data loader
    wants; a handful of giant shards would serialize the sort.

    The exchange is ``repartitionByRange`` on the shard id, not a hash
    repartition: hashing n_shards shard values into n_shards tasks
    collides (~1/e of tasks empty, some tasks sorting 2-3 shards —
    exactly the serialized giant-task skew the sizing advice warns
    about), while range boundaries over the 0..n_shards-1 ids give a
    near-1:1 shard→task mapping. Cost: the range partitioner runs ONE
    extra boundary-sampling pass over the input — worth it for a
    write-once export whose sort parallelism it fixes (round-6 advice
    item)."""
    shard, h = shard_assignment(key_col, n_shards, seed)
    (
        docs.withColumn("shard", shard)
        .withColumn("h", h)
        .repartitionByRange(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "h", key_col)
        .drop("h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def dsir_importance_scores(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    logw_round: int = 8,
    score_round: int = 6,
    features: str = "unigrams",
    n_buckets: int = 10_000,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public): rank raw
    documents by how much more likely their unigrams are under the
    TARGET distribution (the high-quality seed slice selected by the
    ``target`` predicate) than under the rest of the corpus.

    logratio(d) = Σ_tokens ln( p̂_T(term) / p̂_R(term) ), both
    estimates add-one smoothed over the shared vocabulary. Positive ⇒
    target-like.

    ``features``: ``"unigrams"`` (raw terms — the simple form) or
    ``"hashed_ngrams"`` (the paper's ACTUAL feature space, round 7:
    unigrams + bigrams hashed into ``n_buckets`` buckets — Xie et al.
    §3.1 use 10k). The hashed form is the scale contract: the
    log-weight table is ≤ ``n_buckets`` rows at ANY corpus size BY
    CONSTRUCTION, where the raw vocabulary is corpus-dependent and
    unbounded on real text (the synthetic fixture's generator caps
    its vocab at ~950 n-grams, so growth is not observable there —
    the 10× probe instead pins the bucket side flat: 903 observed
    buckets at sf0.01, 917 at sf0.1, bound 10k always). The bucket
    hash is the engine-portable md5 uniform (same family as the
    Gumbel draw), so the DuckDB oracle replays it bit-exactly.

    Spark shape (the ``unigram_logprob`` template): ONE exploded token
    table feeds (a) a per-term (tf, tf_target) aggregate — map-side
    combined — and (b) the per-doc scoring join against the
    log-weight table. The hint rule (round 10): ``hashed_ngrams``
    broadcasts the log-weight table because it is ≤ n_buckets rows BY
    CONSTRUCTION (10 k default at any corpus size); ``unigrams``
    leaves the join UNHINTED — the table is vocabulary-sized
    (Heaps': 10⁸-10⁹ types at 25 T tokens, SCALING.md), so it
    shuffles co-partitioned on term and AQE broadcasts only when
    measured-small. Totals: the unigram form rides a 1-row broadcast
    crossJoin (no driver scalars); the hashed form rides ONE bounded
    global window over the ≤ n_buckets tf table (round 13 — see the
    inline notes). Per-term log-weights are rounded to
    ``logw_round`` BEFORE the exact decimal per-doc sum, so engine
    log() ulps never reach the compared digits.
    """
    from ..oracle import dsum

    if features not in ("unigrams", "hashed_ngrams"):
        raise ValueError(f"unknown features {features!r}")
    if features == "hashed_ngrams":
        # tokenizer materialized at a projection boundary FIRST —
        # expressions referenced inside array lambdas re-evaluate per
        # element (the ngrams_from_tokens rule; violating it here made
        # the regex split run O(tokens) times per row: measured 6 s/
        # scan at sf0.1 vs 0.4 s with the boundary).
        # Round 13: the shared exchange moves to THIS boundary (the
        # unigram_logprob/bigram_logprob protocol) — the old
        # post-md5 repartition never actually unified its consumers
        # (the tf branch pruned to {term, _is_t}, the scoring branch
        # to {doc_id, term}, and the scoring join pushed an inferred
        # isnotnull(term) below the exchange — stage traces showed
        # the scan+tokenize+md5 map stage executing TWICE per run,
        # byte-identical). Both branches consume the identical
        # (doc_id, _is_t, _t) subtree below the exchange; the
        # explode+md5 recompute per branch above it is the documented
        # cheap half. explode_outer + post-filter avoids the pushable
        # size() filter and isnotnull(doc_id) is applied uniformly
        # (the oracle carries the same guard; no declared fixture has
        # NULL ids — canary-pinned).
        # explicit width: the consumers of this exchange are COMPUTE-
        # heavy per row (bigram build + md5 bucketing per gram), so
        # byte-based AQE coalescing under-parallelizes them (observed:
        # the 2 MB token exchange coalesced to 2 tasks, putting the
        # whole md5 ladder on 2 cores of 32) — size the stage by the
        # session's parallelism, the embedding-LSH verify-stage rule
        base = (
            docs.select(
                F.col(id_col).alias("doc_id"),
                target.cast("long").alias("_is_t"),
                tokens(text_col).alias("_t"),
            )
            .where(F.col("doc_id").isNotNull())
            .repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")
        )
        t = F.col("_t")
        bigrams = F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i + 1), F.element_at(t, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        toks = (
            base.select(
                "doc_id",
                "_is_t",
                F.explode_outer(F.concat(t, bigrams)).alias("_g"),
            )
            .where(F.col("_g").isNotNull())
            .select(
                "doc_id",
                "_is_t",
                F.pmod(
                    F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10).cast("long"),
                    F.lit(n_buckets),
                ).alias("term"),
            )
        )
    else:
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            target.cast("long").alias("_is_t"),
            F.explode(tokens(text_col)).alias("term"),
        )
    tf = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"), F.sum("_is_t").alias("tf_t")
    )
    if features == "hashed_ngrams":
        # totals ride ONE bounded global window over the tf table
        # (round 13, guide §2.4): tf is ≤ n_buckets rows BY
        # CONSTRUCTION (10k default at any corpus size), so a single-
        # partition window is safe at any scale here — where the old
        # tot-aggregate + crossJoin(broadcast) consumed tf TWICE and
        # AQE re-executed the whole term-aggregate map stage for the
        # broadcast subquery (stage-trace verified: two byte-identical
        # partial-agg stages per run). Same long sums, same doubles,
        # identical lw values. The unigram form keeps the broadcast
        # crossJoin: its vocabulary is unbounded, so a one-partition
        # window would be a corpus-vocabulary sort on one core.
        from pyspark.sql import Window

        w = Window.partitionBy()
        n_all = F.sum("tf").over(w)
        n_t = F.sum("tf_t").over(w)
        v = F.count(F.lit(1)).over(w)
        logw = tf.select(
            "term",
            F.round(
                F.log((F.col("tf_t") + 1).cast("double") / (n_t + v))
                - F.log(
                    (F.col("tf") - F.col("tf_t") + 1).cast("double")
                    / (n_all - n_t + v)
                ),
                logw_round,
            ).alias("lw"),
        )
    else:
        tot = tf.agg(
            F.sum("tf").alias("_n_all"),
            F.sum("tf_t").alias("_n_t"),
            F.count(F.lit(1)).alias("_v"),
        )
        logw = tf.crossJoin(F.broadcast(tot)).select(
            "term",
            F.round(
                F.log((F.col("tf_t") + 1).cast("double") / (F.col("_n_t") + F.col("_v")))
                - F.log(
                    (F.col("tf") - F.col("tf_t") + 1).cast("double")
                    / (F.col("_n_all") - F.col("_n_t") + F.col("_v"))
                ),
                logw_round,
            ).alias("lw"),
        )
    lw_side = F.broadcast(logw) if features == "hashed_ngrams" else logw
    if features == "hashed_ngrams":
        # the scoring branch GROUPS BY (doc_id, _is_t) — _is_t is
        # per-doc constant (the target predicate row-wise), so the
        # groups, counts and sums are identical to groupBy(doc_id),
        # and HashPartitioning(doc_id) still satisfies the clustered
        # distribution (no extra exchange). The point: a grouping key
        # cannot be column-pruned, so this branch's column set below
        # the shared exchange stays {doc_id, _is_t, _t} — equal to
        # the tf branch's — and ReuseExchange keeps the scans unified
        # (the bigram_logprob keep-all-branch rule; an unused agg
        # expression would be pruned away, a grouping key cannot be).
        return (
            toks.join(lw_side, "term")
            .groupBy("doc_id", "_is_t")
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.round(dsum("lw"), score_round).alias("logratio"),
            )
            .select("doc_id", "n_tokens", "logratio")
        )
    return (
        toks.join(lw_side, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(dsum("lw"), score_round).alias("logratio"),
        )
    )


def dsir_resample_topk(
    scores: DataFrame,
    k: int,
    temperature: float = 1.0,
    seed: str = "42",
    gumbel_round: int = 8,
) -> DataFrame:
    """Gumbel-top-k resampling over DSIR scores: sampling k documents
    WITHOUT replacement with probability ∝ exp(logratio/T) is exactly
    taking the top k of logratio/T + Gumbel noise (the Gumbel-max
    trick). The noise is a pure function of (doc_id, seed) via the
    engine's portable md5 uniform — bit-reproducible across runs,
    engines, and retries, same contract as ``shard_assignment``; a new
    seed is a fresh draw. Plan: scalar projection + TakeOrdered — only
    k·partitions rows move.

    Output: (doc_id, n_tokens, logratio, sample_key, rnk ≤ k)."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir:" + seed))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967298.0)  # (0, 1), never 0 or 1
    gumbel = F.round(-F.log(-F.log(u)), gumbel_round)
    keyed = scores.withColumn(
        "sample_key", F.round(F.col("logratio") / F.lit(float(temperature)), 6) + gumbel
    )
    topk = keyed.orderBy(F.col("sample_key").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("sample_key").desc(), F.col("doc_id"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("int"))


def robust_outlier_filter(
    docs: DataFrame,
    value: Column,
    k: float = 3.5,
    id_col: str = "doc_id",
    round_to: int = 6,
    exact: bool = True,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """Robust outlier screen over any per-document scalar (token
    count, chars, scores): flag documents whose value deviates from
    the corpus MEDIAN by more than ``k`` times the MAD (median
    absolute deviation) — the standard heavy-tail-safe alternative to
    mean/std z-scores for curation thresholds (a handful of giant
    pages cannot drag the cutoff the way they drag a mean).

    ``exact`` (the domain contract, round-7 advice): Spark's EXACT
    ``percentile`` merges a value→count map on ONE reducer task, so
    its memory is O(distinct values) — safe precisely when the value
    domain is BOUNDED (integer token counts, byte lengths: distinct
    values ≤ max doc size regardless of corpus rows). For CONTINUOUS
    values (classifier scores, ratios) at 100 TB that map is O(rows)
    on one task — pass ``exact=False`` to use ``percentile_approx``
    (KLL-style mergeable sketch, memory O(``approx_accuracy``) at any
    scale; default accuracy 10⁴ ⇒ rank error ≤ 1/10⁴, far inside any
    sane MAD threshold). The sketch is deterministic given the data,
    and the declared ``quality_outlier_mad_continuous`` query asserts
    it inside the exact p45..p55 band under the
    ``approx_stats_bounded`` protocol.

    Plan (both modes): two 1-row percentile aggregates (median, then
    MAD of the residuals) broadcast back via crossJoin — fully lazy,
    no driver scalars; the flag itself is then a scalar projection.
    The robust z is rounded so the flag is engine-portable
    (oracle-checked). Zero-MAD corpora (>=half identical values) keep
    every doc (z NULL → not outlier).

    Output: (doc_id, value, robust_z, is_outlier)."""
    vals = docs.select(F.col(id_col).alias("doc_id"), value.cast("double").alias("value"))
    if exact:
        p50 = lambda c: F.percentile(c, F.lit(0.5))  # noqa: E731
    else:
        p50 = lambda c: F.percentile_approx(  # noqa: E731
            c, F.lit(0.5), F.lit(approx_accuracy)
        )
    med = vals.agg(p50(F.col("value")).alias("_med"))
    with_med = vals.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        p50(F.abs(F.col("value") - F.col("_med"))).alias("_mad")
    )
    z = F.round(
        F.abs(F.col("value") - F.col("_med")) / F.nullif(F.col("_mad"), F.lit(0.0)),
        round_to,
    )
    return (
        with_med.crossJoin(F.broadcast(mad))
        .select(
            "doc_id",
            "value",
            z.alias("robust_z"),
            F.coalesce(z > F.lit(float(k)), F.lit(False)).alias("is_outlier"),
        )
    )


def hdr_outlier_filter(
    docs: DataFrame,
    value: Column,
    k: float = 3.5,
    id_col: str = "doc_id",
    sub_bits: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """The MAD outlier screen with BOTH medians read from HDR
    histogram sketches (``operators.sketch.hdr_*``) — the third rung
    of the percentile ladder ``robust_outlier_filter`` documents:

    - ``exact=True``: O(distinct values) on one reducer — bounded
      integer domains only;
    - ``exact=False``: ``percentile_approx`` — fixed memory, but the
      KLL state is opaque and NOT maintainable across batches;
    - this: fixed width (≤ (53−s)·2^s rows), relative error ≤ 2^-s
      (1.6% at the default s=6 — noise against any sane ``k``), and
      the sketch is ADDITIVELY MERGEABLE, so a streaming curator can
      maintain it per batch like its df/HLL tiers and read the
      median/MAD cutoffs for free at any point — no corpus re-scan.
      Pure-integer bucketing also makes it the one approximate rung
      whose screen is HASH-CHECKABLE end-to-end (the declared
      ``quality_outlier_hdr`` query's oracle rebuilds both sketch
      rounds bit-for-bit).

    Domain: non-negative integers ≤ 2^52 (the sketch contract —
    lengths, token counts; residuals stay integral by construction).
    Both medians are bucket LOWER bounds, so each under-states its
    exact counterpart by < 2^-s relative — a conservative, sign-
    stable shift (law-tested against the exact screen).

    Plan: two (scan → map-side-combined sketch agg → sketch-width
    quantile) rounds, each 1-row result broadcast back lazily via
    crossJoin — the ``robust_outlier_filter`` shape with every
    percentile replaced by bounded mergeable state.

    Output: (doc_id, value, robust_z, is_outlier) — same contract as
    ``robust_outlier_filter``."""
    from . import sketch

    vals = docs.select(
        F.col(id_col).alias("doc_id"), value.cast("long").alias("v")
    )
    med = (
        sketch.hdr_quantiles(
            sketch.hdr_build(vals, "v", sub_bits=sub_bits), [0.5], sub_bits=sub_bits
        )
        .select(F.col("est").alias("_med"))
    )
    with_med = vals.crossJoin(F.broadcast(med))
    resid = with_med.select(
        "doc_id", "v", "_med", F.abs(F.col("v") - F.col("_med")).alias("r")
    )
    mad = (
        sketch.hdr_quantiles(
            sketch.hdr_build(resid, "r", sub_bits=sub_bits), [0.5], sub_bits=sub_bits
        )
        .select(F.col("est").alias("_mad"))
    )
    z = F.round(
        F.abs(F.col("v") - F.col("_med")).cast("double")
        / F.nullif(F.col("_mad").cast("double"), F.lit(0.0)),
        round_to,
    )
    return resid.crossJoin(F.broadcast(mad)).select(
        "doc_id",
        F.col("v").cast("double").alias("value"),
        z.alias("robust_z"),
        F.coalesce(z > F.lit(float(k)), F.lit(False)).alias("is_outlier"),
    )


def temperature_domain_rates(
    docs: DataFrame,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    group_col: str = "source",
    w_round: int = 12,
    rate_round: int = 9,
) -> DataFrame:
    """Temperature-based mixture rates (the multilingual/multi-domain
    alpha-sampling of T5 / GPT-3 / Gopher, all public): resample so
    the OUTPUT domain shares are ∝ share^alpha — alpha < 1 flattens
    the mixture (upweights small domains), alpha = 1 keeps natural
    proportions. Returns (group, rate) with
    rate_d = min(1, target_fraction · N · w_d / n_d),
    w_d = share_d^alpha / Σ share^alpha.

    Fully lazy: one domain-count aggregate (domain-sized), 1-row
    totals broadcast back; w_d rounded to ``w_round`` then summed
    under the exact DECIMAL(38,18) protocol so the normalizer is
    partition-order-independent; rates rounded to ``rate_round``
    BEFORE the md5-bucket threshold so the keep decision is
    bit-portable."""
    cnt = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = cnt.agg(F.sum("_n").alias("_nn"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        group_col,
        "_n",
        "_nn",
        F.round(F.pow(F.col("_n") / F.col("_nn"), F.lit(alpha)), w_round).alias("_w"),
    )
    z = w.agg(F.sum(F.col("_w").cast("decimal(38,18)")).cast("double").alias("_z"))
    return w.crossJoin(F.broadcast(z)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_fraction)
                * F.col("_nn")
                * (F.col("_w") / F.col("_z"))
                / F.col("_n"),
            ),
            rate_round,
        ).alias("rate"),
    )


def temperature_domain_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    key_col: str = "doc_id",
    group_col: str = "source",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Alpha-sampling end to end: derive the temperature rates, then
    the deterministic md5-bucket membership of
    ``weighted_domain_sample`` — reproducible across partitionings,
    monotone in target_fraction, zero shuffles beyond the
    domain-sized rate aggregates."""
    rates = temperature_domain_rates(
        docs, alpha=alpha, target_fraction=target_fraction, group_col=group_col
    )
    return weighted_domain_sample(
        docs, rates, key_col=key_col, group_col=group_col, buckets=buckets
    )


def curriculum_shards(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    seed: str = "42",
    score_round: int = 9,
) -> DataFrame:
    """Quality-ordered curriculum export: documents land in their
    reproducible md5 shard (same assignment as ``shuffle_shards`` —
    late-arriving docs never move others), but WITHIN each shard the
    read order is highest-quality-first (the quality-curriculum /
    annealing recipe: schedule the best data where the schedule
    needs it, e.g. the final tokens — Blakeney et al. 2024 "Does
    your data spark joy?" is the public form). Order key =
    (round(quality_score, 9) DESC, doc_id): the score is per-row
    codegen, the rounding makes rank order engine-portable, and the
    only exchange is the shard hash partitioning — the position
    window runs within the partition the data already lives in.

    Returns (key, shard, pos, q)."""
    from .textops import quality_score

    shard, h = shard_assignment(key_col, n_shards, seed)
    q = F.round(quality_score(text_col), score_round)
    w = Window.partitionBy("shard").orderBy(F.desc("q"), F.col(key_col))
    return (
        docs.select(F.col(key_col), shard, q.alias("q"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .select(key_col, "shard", "pos", "q")
    )


def unimax_language_rates(
    docs: DataFrame,
    budget_fraction: float = 0.8,
    max_epochs: float = 1.0,
    lang_col: str = "lang",
    text_col: str = "text",
    rate_round: int = 9,
) -> DataFrame:
    """UniMax language budget allocation (Chung et al. 2023,
    "UniMax: Fairer and more effective language sampling for
    large-scale multilingual pretraining" — public): split a total
    token budget across languages AS EQUALLY AS POSSIBLE, subject to
    a per-language cap of ``max_epochs`` passes over its data —
    low-resource languages get their full cap, the giants absorb the
    leftover equally. This is the successor to temperature sampling
    (``temperature_domain_rates``), which over-samples the tail
    without an epoch bound.

    The waterfilling is CLOSED-FORM over the language-sized aggregate
    (no driver loop, no unrolled iterations): with languages sorted
    by cap ascending, the capped set is the prefix where
    ``cap_i < (B − cumsum_{<i}(cap)) / (L − i + 1)`` (standard
    waterfilling lemma; property-tested against the iterative
    reference), everyone after it shares the remainder equally. One
    map-side-combined token-count aggregate + window arithmetic over
    ≤L rows; rates round to ``rate_round`` before any membership
    threshold, the engine's bit-portability protocol.

    Returns (lang, n_tokens, cap, alloc, rate) with
    ``rate = alloc / n_tokens ≤ max_epochs``. ``max_epochs ≤ 1``
    makes the rates directly usable by ``weighted_domain_sample``;
    larger epoch caps express repetition factors for a packing stage.
    """
    from .textops import token_count

    # all-NULL-text languages sum to NULL — pin them to 0 tokens so
    # the waterfilling arithmetic stays well-defined (cap 0, alloc 0)
    # and the rate guard below emits 0.0 instead of NULL (r8 advice)
    cnt = docs.groupBy(lang_col).agg(
        F.coalesce(F.sum(token_count(text_col)), F.lit(0))
        .cast("double")
        .alias("n_tokens")
    )
    tot = cnt.agg(
        F.sum("n_tokens").alias("_tt"), F.count(F.lit(1)).alias("_l")
    )
    w = Window.orderBy(F.asc("cap"), F.asc(lang_col))
    ranked = (
        cnt.crossJoin(F.broadcast(tot))
        .withColumn("cap", F.col("n_tokens") * F.lit(float(max_epochs)))
        .withColumn("_b", F.col("_tt") * F.lit(float(budget_fraction)))
        .withColumn("_i", F.row_number().over(w))
        .withColumn(
            "_cum_prev",
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "_share", (F.col("_b") - F.col("_cum_prev")) / (F.col("_l") - F.col("_i") + 1)
        )
        .withColumn("_capped", F.col("cap") < F.col("_share"))
    )
    fin = ranked.agg(
        F.sum(F.when(F.col("_capped"), F.col("cap")).otherwise(F.lit(0.0))).alias("_csum"),
        F.sum(F.col("_capped").cast("int")).alias("_k"),
        F.first("_b").alias("_bb"),
        F.first("_l").alias("_ll"),
    ).select(
        F.when(
            F.col("_ll") > F.col("_k"),
            (F.col("_bb") - F.col("_csum")) / (F.col("_ll") - F.col("_k")),
        ).otherwise(F.lit(0.0)).alias("_final_share")
    )
    return (
        ranked.crossJoin(F.broadcast(fin))
        .withColumn(
            "alloc",
            F.when(F.col("_capped"), F.col("cap")).otherwise(
                F.least(F.col("cap"), F.col("_final_share"))
            ),
        )
        .select(
            lang_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("cap"),
            F.col("alloc"),
            # a zero-token language would divide 0/0 = NULL here, and
            # the two consumers coalesced NULL oppositely (sample kept
            # every doc via default_rate, epoch_expand dropped them
            # all) — r8 advice: emit rate 0.0 so both agree (no tokens
            # ⇒ no budget share ⇒ drop)
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("alloc") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                rate_round,
            ).alias("rate"),
        )
    )


def unimax_language_sample(
    docs: DataFrame,
    budget_fraction: float = 0.8,
    max_epochs: float = 1.0,
    key_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    buckets: int = 1_000_000,
) -> DataFrame:
    """UniMax end to end (``max_epochs ≤ 1``): derive the language
    rates, then the deterministic salted-md5 membership of
    ``weighted_domain_sample`` — low-resource languages kept whole,
    the giants downsampled to the equal share."""
    if max_epochs > 1.0:
        raise ValueError(
            "sampling cannot repeat documents; max_epochs > 1 expresses "
            "repetition for a packing stage — use unimax_language_rates"
        )
    rates = unimax_language_rates(
        docs, budget_fraction=budget_fraction, max_epochs=max_epochs,
        lang_col=lang_col, text_col=text_col,
    ).select(lang_col, "rate")
    return weighted_domain_sample(
        docs, rates, key_col=key_col, group_col=lang_col, buckets=buckets
    )


def unimax_epoch_expand(
    docs: DataFrame,
    budget_fraction: float = 2.0,
    max_epochs: float = 3.0,
    key_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    buckets: int = 1_000_000,
) -> DataFrame:
    """The ``max_epochs > 1`` half of UniMax: rates above 1 are
    REPETITION factors, not keep probabilities — each document is
    emitted ``floor(rate)`` times plus one more with probability
    ``frac(rate)`` (deterministic salted-md5 membership, the same
    bucket the sampling path thresholds), so a language allotted 2.4
    epochs contributes every doc twice and a reproducible 40% of them
    a third time. Output rows carry ``copy`` (1-based) — the
    repetition stream a packing stage (``pack_training_sequences``)
    consumes. Expansion is one broadcast rate join + one
    ``explode(sequence(...))`` riding the corpus scan — the blow-up
    factor is the data you ASKED for, never a shuffle."""
    rates = unimax_language_rates(
        docs, budget_fraction=budget_fraction, max_epochs=max_epochs,
        lang_col=lang_col, text_col=text_col,
    ).select(lang_col, "rate")
    bucket = _md5_bucket(key_col, buckets, salt=":mix")
    joined = docs.join(F.broadcast(rates), lang_col, "left").withColumn(
        "_rate", F.coalesce(F.col("rate"), F.lit(0.0))
    )
    n_copies = (
        F.floor(F.col("_rate")).cast("int")
        + (
            bucket
            < F.round((F.col("_rate") - F.floor(F.col("_rate"))) * buckets, 0).cast(
                "bigint"
            )
        ).cast("int")
    )
    return (
        joined.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("rate", "_rate", "_n")
    )


def doremi_domain_weights(
    docs: DataFrame,
    iters: int = 3,
    eta: float = 1.0,
    smoothing: float = 0.2,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DoReMi domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
    Data Mixtures Speeds Up Language Model Pretraining" — public),
    Algorithm 1 run as a STATIC analysis pass over the corpus: the
    training-mixture weights are multiplicative-weight updates driven
    by per-domain EXCESS LOSS — domains where the weak model still
    has headroom against the reference get upweighted.

    The paper's proxy/reference pair is two trained transformers; the
    engine's self-contained analog uses its two corpus-fit LMs —
    proxy ℓ_p = unigram cross-entropy (the weak model) and reference
    ℓ_r = interpolated-bigram cross-entropy (the stronger one) — so
    excess(d) = avg_d(max(ℓ_p − ℓ_r, 0)) measures each domain's
    learnable contextual structure. Docs without a bigram score
    (<2 tokens) are excluded from the domain average (no loss is
    defined for them under either model).

    The multiplicative-weights fold is exactly the paper's update,
    iterated ``iters`` times from uniform:

        g_d   = round(w_d · exp(η · λ_d), 6)
        w_d'  = round((1−c) · g_d / Σ g + c / L, 9)

    with smoothing ``c`` mixing back toward uniform each step (the
    smoothing is what makes the iteration a genuine fold rather than
    one closed-form softmax). Everything is the engine's portability
    protocol: λ rounded to 6 via exact decimal averages, gains
    rounded before the exact decimal normalizer, weights rounded to
    9 — so the whole optimization unrolls into a DuckDB oracle
    (``mix_doremi_weights``).

    Scale shape: two LM scoring passes over the corpus (each the
    single-tokenization-scan plan of its scorer — and since round 12
    BOTH scorers hang off ONE shared tokenization exchange, see
    ``unigram_logprob``), ONE domain-sized aggregate, then the packed
    array fold of :func:`doremi_mw_fold` over ≤L rows on one row —
    the fold costs nothing at any corpus size. Returns
    (``domain_col``, excess, weight); feed the weights to
    ``weighted_domain_sample`` as rates ∝ weight/share to realize
    the mixture.

    Cache lifecycle (round 12): NOTHING is persisted anymore — the
    packed fold consumes the excess table exactly once, so the
    r9-advice cache (and its 2^iters re-scan hazard) is gone.
    ``_engine_caches`` stays on the result as an (empty) handle so
    :func:`release_caches` remains a uniform no-op for callers."""
    from ..oracle import dsum
    from .textops import bigram_logprob, unigram_logprob

    if not 0.0 <= smoothing < 1.0:
        raise ValueError(f"smoothing must be in [0, 1), got {smoothing}")
    uni = unigram_logprob(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", "mean_logprob"
    )
    bi = bigram_logprob(docs, text_col=text_col, id_col=id_col).select(
        "doc_id", "xent"
    ).filter(F.col("xent").isNotNull())
    perdoc = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(domain_col).alias("_dom")
        )
        .join(uni, "doc_id")
        .join(bi, "doc_id")
        .select(
            "_dom",
            F.round(
                F.greatest(
                    (-F.col("mean_logprob")) - F.col("xent"), F.lit(0.0)
                ),
                6,
            ).alias("_ex"),
        )
    )
    lam = perdoc.groupBy("_dom").agg(
        F.round(dsum("_ex") / F.count(F.lit(1)), 6).alias("excess")
    )
    # The MW fold (round 12) packs the domain table into ONE row and
    # folds in array expressions, so lam has exactly ONE consumer —
    # no persist needed (the r9-advice cache lifecycle existed only
    # because the old row-wise fold referenced lam 2^iters times).
    out = doremi_mw_fold(
        lam, iters=iters, eta=eta, smoothing=smoothing
    ).select(
        F.col("_dom").alias(domain_col), F.col("excess"), F.col("weight")
    )
    out._engine_caches = []
    return out


def doremi_mw_fold(
    lam: DataFrame,
    iters: int = 3,
    eta: float = 1.0,
    smoothing: float = 0.2,
) -> DataFrame:
    """The DoReMi multiplicative-weights fold over a (``_dom``,
    ``excess``) table (Xie 2023 Algorithm 1, the engine's rounding
    protocol — round 10 factored out of :func:`doremi_domain_weights`
    so the curator's maintained excess tier derives weights through
    the IDENTICAL plan): from uniform, ``iters`` rounds of
    g = round(w·exp(η·excess), 6), w' = round((1−c)·g/Σg + c/L, 9),
    every normalizer a 1-row broadcast. Input is domain-sized; the
    fold costs nothing at any corpus size. Returns (_dom, excess,
    weight).

    Round 12 (optimization): the fold runs as ARRAY expressions over
    the domain table packed into one row (collect_list is in-bounds
    by the same ≤L contract that let the old form broadcast every
    normalizer — DoReMi domain counts are tens, not millions). The
    previous row-wise form referenced each iteration's frame twice
    (gain projection + normalizer crossJoin), so the LOGICAL plan
    doubled per iteration — 2^iters copies of the corpus-scale lam
    subtree, a 3,200-line physical plan Catalyst re-optimized on
    every run (~170 scan nodes), and the reason lam had to be
    persist()ed at all. The packed fold consumes lam ONCE; arithmetic
    is expression-for-expression identical (same rounds, exact
    DECIMAL(38,18) normalizer sums — order-independent, so the
    array order cannot matter; sort_array keeps it deterministic
    anyway), so the oracle hash is unchanged."""
    c = float(smoothing)
    dec = "decimal(38,18)"
    cur = lam.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("_dom"), F.col("excess")))
        ).alias("_a")
    )
    n_l = F.size(F.col("_a")).cast("bigint")  # the old count(1) _l
    # one projection boundary per step: nesting the whole fold into a
    # single expression re-embeds every prior iteration inside each
    # lambda (4 references/iteration), and analyzer lambda-variable
    # resolution over the 4^iters-duplicated tree takes MINUTES.
    # Column-per-step keeps the tree linear in iters.
    cur = cur.select(
        "_a",
        F.transform(
            F.col("_a"),
            lambda x: F.struct(
                x["_dom"].alias("_dom"),
                x["excess"].alias("excess"),
                F.round(F.lit(1.0) / n_l, 9).alias("weight"),
            ),
        ).alias("_w"),
    )
    for _ in range(iters):
        cur = cur.select(
            "_a",
            "_w",
            F.transform(
                F.col("_w"),
                lambda x: F.round(
                    x["weight"] * F.exp(F.lit(float(eta)) * x["excess"]), 6
                ),
            ).alias("_g"),
        )
        # dsum twin with SQL SUM's null semantics (nulls skipped,
        # all-null -> NULL), referenced exactly once: start from NULL,
        # coalesce the accumulator on the first non-null element.
        # Exact decimal adds are order-independent, so this equals the
        # old row-wise sum(cast(g as decimal(38,18))) bit-for-bit.
        cur = cur.select(
            "_a",
            "_w",
            "_g",
            F.aggregate(
                F.col("_g"),
                F.lit(None).cast(dec),
                lambda acc, g: F.when(g.isNull(), acc).otherwise(
                    (F.coalesce(acc, F.lit(0).cast(dec)) + g.cast(dec)).cast(dec)
                ),
            ).cast("double").alias("_tg"),
        )
        tg = F.col("_tg")
        cur = cur.select(
            "_a",
            F.zip_with(
                F.col("_w"),
                F.col("_g"),
                lambda x, g: F.struct(
                    x["_dom"].alias("_dom"),
                    x["excess"].alias("excess"),
                    F.round(
                        F.lit(1.0 - c) * g / tg + F.lit(c) / n_l, 9
                    ).alias("weight"),
                ),
            ).alias("_w"),
        )
    return cur.select(F.explode(F.col("_w")).alias("_r")).select(
        F.col("_r._dom").alias("_dom"),
        F.col("_r.excess").alias("excess"),
        F.col("_r.weight").alias("weight"),
    )


def release_caches(df: DataFrame) -> None:
    """Unpersist the subtrees an operator persist()ed on behalf of a
    lazily-returned plan (attached as ``_engine_caches``). Call AFTER
    materializing the result; a no-op for plans without the handle."""
    for cached in getattr(df, "_engine_caches", ()):
        cached.unpersist()


def doremi_domain_sample(
    docs: DataFrame,
    target_fraction: float = 0.5,
    iters: int = 3,
    eta: float = 1.0,
    smoothing: float = 0.2,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Realize the DoReMi mixture: per-domain keep rates from the
    MW-optimized weights (rate_d = min(1, f·N·w_d / n_d) — the
    ``temperature_domain_rates`` realization with the optimized
    weights as target shares), membership via the deterministic
    salted-md5 bucket of :func:`weighted_domain_sample`. Returns the
    kept (id, domain) rows."""
    wfull = doremi_domain_weights(
        docs, iters=iters, eta=eta, smoothing=smoothing,
        domain_col=domain_col, text_col=text_col, id_col=id_col,
    )
    w = wfull.select(domain_col, "weight")
    cnt = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = cnt.agg(F.sum("_n").alias("_nn"))
    rates = (
        w.join(cnt, domain_col)
        .crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_fraction))
                    * F.col("_nn")
                    * F.col("weight")
                    / F.col("_n"),
                ),
                9,
            ).alias("rate"),
        )
    )
    out = weighted_domain_sample(
        docs, rates, key_col=id_col, group_col=domain_col, buckets=buckets
    ).select(id_col, domain_col)
    out._engine_caches = list(getattr(wfull, "_engine_caches", ()))
    return out
