"""Distributed BPE tokenizer training — learning the merge table of a
byte-pair-encoding vocabulary from the corpus (Sennrich et al. 2016;
the GPT-2 tokenizer recipe).

This closes the tokenizer side of the training-data pipeline: the
engine already COUNTS tokens (``textops.token_count`` /
``bpe_ish_token_count``) and budgets them (``curation.token_budget_
quota``); this module LEARNS the subword vocabulary those counts would
be measured in. The scale contract is the one real BPE trainers use
(HuggingFace ``tokenizers``, SentencePiece BPE): the corpus is read
EXACTLY ONCE to build the word-frequency table, and every merge
iteration runs over word TYPES weighted by count — a vocabulary-sized
table, not the corpus. At 100 TB the word-count aggregation is the
only corpus-scale stage (one map-side-combined shuffle); the K merge
iterations touch only the type table, and the driver holds exactly one
(pair, count) row per iteration — the learned model itself, K rows
total, the same bounded-collect contract as the k-means centroids and
the classifier's gradient rows.

Greedy-rewrite semantics: each iteration merges the LEFTMOST
NON-OVERLAPPING occurrences of the winning pair within every word
(the standard BPE tokenize-step semantics; for a pair ``(a, a)`` the
word ``aaaaa`` becomes ``aa aa a``, never ``a aa aa``). The rewrite is
a pure Catalyst ``aggregate`` fold over each word's symbol array with
the winning pair as literals — no shuffle, no Python worker, and the
fold state is (emitted symbols, one pending symbol), so it is O(word
length) like the reference scan. Ties on pair count break
deterministically by (left, right) string order so the learned merge
table is reproducible across engines and partitionings.

The matching DuckDB oracle (``queries._bpe_oracle``) replays the SAME
iterations as unrolled CTE blocks, expressing the greedy rewrite
relationally (match positions → gaps-and-islands parity within runs →
rebuild), the ``cluster_kmeans_assign`` / ``quality_classifier_scores``
protocol for hash-checking an iterative fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import tokens

# Result schema of bpe_learn_merges — shared with the oracle twin.
MERGES_SCHEMA = "rnk INT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the whitespace-tokenized corpus — the ONE
    corpus-scale stage of BPE training. Map-side-combined two-level
    aggregation; output is vocabulary-sized."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _chars(word) -> F.Column:
    """word → array of single characters (the initial symbol
    sequence). Pure codegen: transform over sequence(1, length)."""
    w = F.col(word) if isinstance(word, str) else word
    # guard the empty word: Spark's sequence(1, 0) DESCENDS ([1, 0]),
    # it is not empty like DuckDB's range(1, 1)
    return F.when(F.length(w) >= 1,
        F.transform(F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1)))
    ).otherwise(F.expr("cast(array() as array<string>)"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word count, over the
    TYPE table. sequence(1, n-1) is guarded for n == 1 because Spark's
    sequence() descends when start > stop."""
    pairs = vocab.select(
        "cnt",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS lhs, syms[i] AS rhs))"
                ),
            ).otherwise(F.expr("cast(array() as array<struct<lhs: string, rhs: string>>)"))
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")).agg(
        F.sum("cnt").alias("c")
    )


def _sql_str_lit(s: str) -> str:
    """A string literal safe to inject into SQL text for ANY token
    (quotes, backslashes, non-ASCII): hex-encode through decode(unhex)
    — constant-folded by Catalyst, so it costs nothing at runtime."""
    if s == "":
        return "''"
    return f"decode(unhex('{s.encode('utf-8').hex()}'), 'UTF-8')"


def _merge_fold_sql(operand: str, x: str, y: str) -> str:
    """:func:`_merge_fold` as ONE parsed SQL string (round 13): the
    merge-learning loops build a fresh fold expression per round, and
    the Column form costs ~40 py4j round-trips each time (~70 ms/round
    of driver latency at 10 rounds). Same expression semantics —
    if() instead of CASE WHEN evaluates identically — so the rewritten
    symbol arrays are byte-equal (pinned by test_tokenizer's
    reference-equality suites)."""
    X, Y, M = _sql_str_lit(x), _sql_str_lit(y), _sql_str_lit(x + y)
    flush = "if(acc.prev is not null, concat(acc.out, array(acc.prev)), acc.out)"
    return (
        f"aggregate({operand}, "
        "named_struct('out', cast(array() as array<string>), 'prev', cast(null as string)), "
        f"(acc, s) -> if(coalesce(acc.prev = {X}, false) and s = {Y}, "
        f"named_struct('out', concat(acc.out, array({M})), 'prev', cast(null as string)), "
        f"named_struct('out', {flush}, 'prev', s)), "
        f"acc -> {flush})"
    )


def _merge_fold(syms: F.Column, x: str, y: str) -> F.Column:
    """Greedy leftmost non-overlapping merge of the pair (x, y) inside
    one symbol array, as a Catalyst aggregate fold. State is
    struct(out: emitted symbols, prev: one pending symbol); a match
    consumes the pending symbol so an overlapping occurrence (x == y)
    cannot re-use it — exactly the reference BPE scan."""
    merged = x + y
    init = F.struct(
        F.expr("cast(array() as array<string>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        is_match = F.coalesce(acc["prev"] == F.lit(x), F.lit(False)) & (s == F.lit(y))
        return F.when(
            is_match,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
                )
                .otherwise(acc["out"])
                .alias("out"),
                s.alias("prev"),
            )
        )

    def finish(acc):
        return (
            F.when(acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"])))
            .otherwise(acc["out"])
        )

    return F.aggregate(syms, init, step, finish)


def bpe_learn_merges(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    merge table (rnk, lhs, rhs, merged, pair_count) in learned order —
    the model artifact a tokenizer would apply.

    Iteration shape: pair-count aggregation over the vocabulary-sized
    type table → ONE (pair, count) row collected to the driver (the
    model row — bounded by contract) → rewrite as a literal-pair
    Catalyst fold projection. The type table is localCheckpoint-ed per
    iteration so iteration k's plan never re-executes iterations
    0..k-1 (the ``dedup_clusters`` lineage-control pattern); the
    superseded checkpoint is freed eagerly.

    Stops early if no pair occurs at least twice (merging a count-1
    pair is never useful and would make later iterations degenerate).
    """
    from .dedup import _free_local_checkpoint

    spark = docs.sparkSession
    # lazy initial checkpoint (round 13, guide §2.4): the first
    # iteration's pair-count job is a TakeOrdered over an aggregate —
    # it computes every vocab partition, materializing the blocks as
    # part of that job instead of a dedicated upfront one
    vocab = (
        word_counts(docs, text_col)
        .select("word", "cnt", _chars("word").alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    pending: DataFrame | None = None  # superseded checkpoint, freed late
    try:
        for k in range(1, num_merges + 1):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("c"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            # this job just materialized vocab's (lazy) checkpoint, so
            # its parent's blocks are no longer reachable — free them
            # only NOW (freeing before the materializing job would cut
            # the lineage the job still needs)
            if pending is not None:
                _free_local_checkpoint(pending)
                pending = None
            if not top or top[0]["c"] < 2:
                break
            x, y, c = top[0]["lhs"], top[0]["rhs"], int(top[0]["c"])
            merges.append((k, x, y, x + y, c))
            # lazy checkpoint: materializes as part of the NEXT
            # iteration's pair-count job instead of a job of its own —
            # one Spark job per merge instead of two
            new_vocab = vocab.select(
                "word", "cnt", F.expr(_merge_fold_sql("syms", x, y)).alias("syms")
            ).localCheckpoint(eager=False)
            pending = vocab
            vocab = new_vocab
    finally:
        if pending is not None:
            _free_local_checkpoint(pending)
        _free_local_checkpoint(vocab)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge table: per word, apply the merges
    in learned order (the BPE encode step). Pure projection — the
    merge list is literals, each merge one fold — so encoding
    distributes with zero shuffles and zero Python workers; at 100 TB
    this rides inside the corpus scan stage.

    Output: ``out_col`` = flat subword array per document."""
    per_word = F.transform(tokens(text_col), lambda w: _chars(w))
    for x, y in merges:
        per_word = F.transform(per_word, lambda s: _merge_fold(s, x, y))
    return docs.withColumn(out_col, F.flatten(per_word))


def _symbol_counts(vocab: DataFrame) -> DataFrame:
    """(sym, cu) symbol-occurrence counts weighted by word count over
    the type table — the denominator side of the WordPiece score."""
    return (
        vocab.select("cnt", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("cnt").alias("cu"))
    )


def wordpiece_learn_merges(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """WordPiece merge learning (Schuster & Nakajima 2012; the BERT
    vocabulary recipe as HF ``tokenizers`` trains it): identical
    machinery to :func:`bpe_learn_merges` — one corpus-scale word
    count, merge iterations over word TYPES, greedy leftmost
    non-overlapping rewrite as a literal-pair Catalyst fold — but the
    winning pair maximizes the LIKELIHOOD score
    ``count(pair) / (count(lhs) * count(rhs))`` instead of the raw
    pair count: merge the pair whose parts co-occur most above chance,
    not the most frequent one. Counts are exact BIGINTs cast to
    DOUBLE before the ratio, so the score is one IEEE division of
    identical inputs in both engines — byte-deterministic, no rounding
    protocol needed; ties break by (lhs, rhs) like BPE. The same
    ``c >= 2`` floor stops degenerate tails. Returns (rnk, lhs, rhs,
    merged, pair_count, score).

    Encoding with the learned table is merge application
    (:func:`apply_bpe`) — the continuation-prefix ("##") rendering of
    a serialized BERT vocab is a formatting concern of the artifact,
    not of the learned merges."""
    from .dedup import _free_local_checkpoint

    spark = docs.sparkSession
    # lazy initial checkpoint — see bpe_learn_merges (the first
    # score job computes every vocab partition)
    vocab = (
        word_counts(docs, text_col)
        .select("word", "cnt", _chars("word").alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, str, int, float]] = []
    pending: DataFrame | None = None
    try:
        for k in range(1, num_merges + 1):
            pc = _pair_counts(vocab).filter(F.col("c") >= 2)
            uc = _symbol_counts(vocab)
            top = (
                pc.join(
                    uc.select(F.col("sym").alias("lhs"), F.col("cu").alias("cl")),
                    "lhs",
                )
                .join(
                    uc.select(F.col("sym").alias("rhs"), F.col("cu").alias("cr")),
                    "rhs",
                )
                .withColumn(
                    "score",
                    F.col("c").cast("double")
                    / (F.col("cl").cast("double") * F.col("cr").cast("double")),
                )
                .orderBy(F.desc("score"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if pending is not None:
                _free_local_checkpoint(pending)
                pending = None
            if not top:
                break
            x, y = top[0]["lhs"], top[0]["rhs"]
            merges.append(
                (k, x, y, x + y, int(top[0]["c"]), float(top[0]["score"]))
            )
            new_vocab = vocab.select(
                "word", "cnt", F.expr(_merge_fold_sql("syms", x, y)).alias("syms")
            ).localCheckpoint(eager=False)
            pending = vocab
            vocab = new_vocab
    finally:
        if pending is not None:
            _free_local_checkpoint(pending)
        _free_local_checkpoint(vocab)
    return spark.createDataFrame(
        merges,
        "rnk INT, lhs STRING, rhs STRING, merged STRING, "
        "pair_count BIGINT, score DOUBLE",
    )


# ---------------------------------------------------------------------
# Unigram-LM tokenizer training (Kudo 2018, "Subword regularization" —
# the SentencePiece `unigram` model; public). Round 9 completes the
# engine's subword-trainer trio: BPE (greedy merges), WordPiece
# (likelihood-scored merges), unigram LM (probabilistic pieces pruned
# by EM). The variant here is hard-EM (Viterbi counts — the
# deterministic member of the EM family; SentencePiece's full
# forward-backward E-step is a soft version of the same fixed point),
# which keeps every quantity integer-or-rounded and therefore lets an
# independent pure-python reference reproduce the model byte for byte
# (the committed-golden oracle protocol of the fold family).
#
# Scale contract — the same one the real trainers use and BPE above
# documents: ONE corpus-scale stage (the word-frequency aggregate);
# the substring seeding and every EM iteration run over word TYPES
# weighted by count; the driver holds only the piece table, bounded
# by ``vocab_size`` BY CONSTRUCTION (the learned model itself, the
# k-means-centroids bounded-collect contract).

UNIGRAM_SCHEMA = "piece STRING, logprob DOUBLE"

# Fixed score of each reserved <0xNN> byte piece (SentencePiece's
# byte_fallback contract: byte tokens score far below any learned
# piece, so byte decomposition is the segmentation of LAST resort —
# chosen only where no learned piece exists). A table constant, not a
# corpus estimate: deterministic across fits, and the stored piece
# table is self-describing (encode detects the contract from the
# <0x00> row).
BYTE_PIECE_LP = -20.0


def byte_pieces(ch: str) -> list[str]:
    """The ``<0xNN>`` byte-piece decomposition of one character — its
    UTF-8 bytes in order (the SentencePiece ``byte_fallback``
    rendering)."""
    return [f"<0x{b:02X}>" for b in ch.encode("utf-8")]


def _viterbi_segment(
    word: str, lp: dict, max_len: int, byte_lp: float | None = None
):
    """Best segmentation of ``word`` under piece log-probs ``lp``:
    maximize the logprob sum; EXACT-TIE break prefers the longer last
    piece at each DP cell (deterministic, and identical in the
    pure-python golden generator). Returns None when unsegmentable
    (cannot happen while the alphabet floor keeps every single char
    in the model).

    ``byte_lp`` (round 11 — the SentencePiece ``byte_fallback``
    contract): when set, a single character ABSENT from ``lp`` gets a
    fallback candidate worth ``byte_lp × n_utf8_bytes(char)`` whose
    reconstruction emits the ``<0xNN>`` byte pieces — so every word
    is segmentable with zero unknowns. The fallback exists only for
    UNSEEN characters (a learned char always segments as itself, the
    SentencePiece rule), competes in the same DP (a longer learned
    piece spanning the position still wins where one exists), and is
    deterministic: the byte score is a fixed table constant, not a
    corpus estimate."""
    n = len(word)
    best = [None] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    fb = [False] * (n + 1)
    for pos in range(1, n + 1):
        b = None
        bl = 0
        bf = False
        for length in range(1, min(max_len, pos) + 1):
            prev = best[pos - length]
            if prev is None:
                continue
            span = word[pos - length : pos]
            v = lp.get(span)
            f = False
            if v is None:
                if byte_lp is None or length != 1:
                    continue
                v = byte_lp * len(span.encode("utf-8"))
                f = True
            cand = prev + v
            if b is None or cand > b or (cand == b and length > bl):
                b, bl, bf = cand, length, f
        best[pos], back[pos], fb[pos] = b, bl, bf
    if best[n] is None:
        return None
    out = []
    pos = n
    while pos > 0:
        length = back[pos]
        if fb[pos]:
            out.extend(reversed(byte_pieces(word[pos - 1])))
        else:
            out.append(word[pos - length : pos])
        pos -= length
    out.reverse()
    return out


def _alt_logprob(piece: str, lp: dict, max_len: int) -> float | None:
    """Best segmentation log-prob of ``piece`` WITHOUT using the
    full-span piece itself — the re-segmentation cost its occurrences
    pay if it is pruned (Kudo 2018 §3.2 loss, hard-EM form). A piece
    cannot occur as a proper substring of itself, so excluding the
    full span is the complete exclusion. None = unsegmentable without
    it (keep forever; unreachable while the alphabet floor holds)."""
    n = len(piece)
    best = [None] * (n + 1)
    best[0] = 0.0
    for pos in range(1, n + 1):
        b = None
        for length in range(1, min(max_len, pos) + 1):
            if length == n:  # the full-span candidate IS the piece
                continue
            prev = best[pos - length]
            if prev is None:
                continue
            v = lp.get(piece[pos - length : pos])
            if v is None:
                continue
            cand = prev + v
            if b is None or cand > b:
                b = cand
        best[pos] = b
    return best[n]


def _prune_pieces(
    counts: dict, lp: dict, max_piece_len: int, target_total: int
) -> dict:
    """One pruning round (Kudo 2018 §3.2, hard-EM form): rank every
    multi-char piece by likelihood LOSS if removed — loss(x) = c(x) ·
    (log p(x) − alt(x)) with alt(x) the piece's own best
    re-segmentation under the rest of the model — and keep the
    top-(target_total − |alphabet|) by (loss desc, piece asc). Single
    chars NEVER prune (the required-chars rule). Pure driver work
    over the model-sized table. Returns the kept counts (caller
    renormalizes)."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = [p for p in counts if len(p) > 1]
    k_keep = max(0, target_total - len(chars))
    if len(multi) <= k_keep:
        return counts
    losses = []
    for p in multi:
        alt = _alt_logprob(p, lp, max_piece_len)
        loss = (
            float("inf")
            if alt is None
            else counts[p] * (lp[p] - alt)
        )
        losses.append((p, loss))
    losses.sort(key=lambda t: (-t[1], t[0]))
    kept = dict(chars)
    for p, _ in losses[:k_keep]:
        kept[p] = counts[p]
    return kept


def _seed_piece_counts(wc: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, c): every substring occurrence of every word TYPE up to
    ``max_piece_len`` chars, weighted by the word's corpus count — the
    Kudo seed vocabulary statistics. Two nested explodes over the
    type table + one map-side-combined aggregate; output is bounded
    by the substring-type vocabulary, never the corpus."""
    w = F.col("word")
    lens = wc.select(
        "word",
        "cnt",
        F.explode(
            F.sequence(F.lit(1), F.least(F.length(w), F.lit(max_piece_len)))
        ).alias("L"),
    )
    subs = lens.select(
        "cnt",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - F.col("L") + 1),
                lambda i: F.col("word").substr(i, F.col("L")),
            )
        ).alias("piece"),
    )
    return subs.groupBy("piece").agg(F.sum("cnt").alias("c"))


def unigram_learn_pieces(
    docs: DataFrame,
    vocab_size: int = 60,
    max_piece_len: int = 4,
    iters: int = 2,
    text_col: str = "text",
    round_to: int = 9,
    seed_size: int | None = None,
    prune_frac: float = 0.2,
    trace: list | None = None,
    byte_fallback: bool = False,
) -> DataFrame:
    """Learn a unigram-LM piece table: seed = all single chars plus
    the top multi-char substrings by weighted count (ties → piece
    string order); then ``iters`` hard-EM rounds — E: Viterbi-best
    segmentation of every word type under the current log-probs
    (Arrow-batched kernel over the TYPE table, counts weighted by
    word frequency); M: logprob = round(ln(count/total), round_to).
    Multi-char pieces that win zero segmentations self-prune out of
    the model; single chars carry a count floor of 1 so every word
    stays segmentable (the alphabet never prunes — SentencePiece's
    required-chars rule).

    Pruning schedule (round 10 — Kudo 2018 §3.2, the paper's own
    loop): seed with ``seed_size`` pieces (> vocab_size; None = seed
    straight at vocab_size, the round-9 behavior), and after each EM
    round prune to max(vocab_size, ceil(current·(1−prune_frac)))
    pieces — the final round lands exactly on ``vocab_size`` — by
    likelihood LOSS: loss(x) = c(x)·(log p(x) − alt(x)), alt(x) the
    piece's best re-segmentation under the rest of the model (what
    its occurrences pay if it is dropped). Keep top-loss, ties by
    piece string; renormalize the survivors. ``trace`` (optional
    list) records the model size after each round — the monotone-
    shrink law the tests pin.

    ``byte_fallback`` (round 11 — the SentencePiece contract that
    completes Kudo-fidelity): append the 256 reserved ``<0xNN>`` byte
    pieces at the fixed ``BYTE_PIECE_LP`` score to the returned
    table. The learned rows are bit-identical either way (training
    never sees byte tokens); the stored table becomes
    self-describing — :func:`unigram_encode` detects the ``<0x00>``
    row and segments unseen characters into their UTF-8 byte pieces
    instead of emitting an unsplit unknown, so EVERY input becomes
    segmentable.

    Scale shape unchanged: the E-step is the Arrow kernel over word
    TYPES; seeding, loss ranking and pruning are pure driver work
    over the seed_size-bounded model table (Viterbi on ≤max_piece_len
    strings), never a corpus pass. Returns (piece, logprob) sorted by
    piece."""
    import math

    from collections import Counter

    import pandas as pd

    spark = docs.sparkSession
    if seed_size is not None and seed_size < vocab_size:
        raise ValueError(
            f"seed_size {seed_size} must be >= vocab_size {vocab_size}"
        )
    wc = word_counts(docs, text_col).persist()
    # persist the seed-count aggregate too (round 13, guide §2.4):
    # its TWO consumers below (alphabet collect + top-k multi-char
    # collect) each re-ran the double-explode + aggregate over the
    # cached type table; the table is substring-type-sized (bounded
    # by vocab·max_piece_len, never the corpus), so the cache is tiny
    # and the seed statistics compute once
    pc = _seed_piece_counts(wc, max_piece_len).persist()
    chars_rows = pc.filter(F.length("piece") == 1).collect()  # alphabet-sized
    k_multi = max(0, (seed_size or vocab_size) - len(chars_rows))
    multi_rows = (
        pc.filter(F.length("piece") > 1)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(k_multi)
        .collect()
    )
    pc.unpersist()
    counts = {r["piece"]: int(r["c"]) for r in list(chars_rows) + list(multi_rows)}
    tot = sum(counts.values())
    lp = {p: round(math.log(c / tot), round_to) for p, c in counts.items()}
    for it in range(iters):
        blp = spark.sparkContext.broadcast(lp)
        mpl = max_piece_len

        def estep(batches):
            agg: Counter = Counter()
            for pdf in batches:
                for word, cnt in zip(pdf["word"], pdf["cnt"]):
                    seg = _viterbi_segment(word, blp.value, mpl)
                    if seg is None:
                        continue
                    c = int(cnt)
                    for p in seg:
                        agg[p] += c
            if agg:
                yield pd.DataFrame(
                    {"piece": list(agg.keys()), "c": list(agg.values())}
                )

        rows = (
            wc.mapInPandas(estep, "piece string, c long")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        # the collect() fully materialized this E-step — drop the
        # iteration's broadcast now so a long-lived session doesn't
        # accumulate one vocab-sized blob per EM round (r9 ADVICE)
        blp.destroy()
        new_counts = {r["piece"]: int(r["c"]) for r in rows}
        for p in lp:
            if len(p) == 1:
                new_counts.setdefault(p, 1)  # alphabet floor
        tot = sum(new_counts.values())
        lp = {
            p: round(math.log(c / tot), round_to)
            for p, c in new_counts.items()
        }
        # Kudo §3.2 prune: schedule toward vocab_size, exact on the
        # last round; a no-op whenever already at/below target (the
        # seed_size=None legacy path)
        target = (
            vocab_size
            if it == iters - 1
            else max(
                vocab_size, math.ceil(len(new_counts) * (1.0 - prune_frac))
            )
        )
        if len(new_counts) > target:
            new_counts = _prune_pieces(new_counts, lp, max_piece_len, target)
            tot = sum(new_counts.values())
            lp = {
                p: round(math.log(c / tot), round_to)
                for p, c in new_counts.items()
            }
        if trace is not None:
            trace.append(len(lp))
    wc.unpersist()
    if byte_fallback:
        # the 256 reserved byte pieces ride the RETURNED table (the
        # SentencePiece byte_fallback contract): fixed BYTE_PIECE_LP
        # score, additional to vocab_size (documented deviation from
        # SentencePiece, which spends vocab slots on them — the
        # learned table stays bit-identical to byte_fallback=False).
        # They can never collide with learned pieces ('<0xNN>' is 6
        # chars > max_piece_len in every registered config, and the
        # corpus alphabet never contains the literal token), and
        # training above never sees them: DP spans are raw substrings.
        for b in range(256):
            lp[f"<0x{b:02X}>"] = BYTE_PIECE_LP
    return spark.createDataFrame(sorted(lp.items()), UNIGRAM_SCHEMA)


def unigram_encode(
    docs: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Tokenize the corpus under a learned unigram piece table:
    Viterbi segmentation runs ONCE PER WORD TYPE (Arrow kernel over
    the type table — the train/encode shape BPE's ``apply_bpe``
    documents), then a positional join rebuilds each document as its
    space-joined piece stream. Returns (doc_id, n_pieces, encoded).

    The piece table is self-describing: when it carries the 256
    reserved ``<0xNN>`` rows (a ``byte_fallback=True`` fit), unseen
    characters segment into their UTF-8 byte pieces at the table's
    byte score and NO word is ever emitted unsplit — zero unknowns by
    construction. Without them, a word whose characters are outside
    the model alphabet falls back to the unsplit word (the pre-r11
    behavior, unchanged)."""
    import pandas as pd

    spark = docs.sparkSession
    lp = {
        r["piece"]: float(r["logprob"]) for r in pieces.collect()
    }  # model-sized by the vocab_size contract
    byte_lp = lp.get("<0x00>")  # present iff the fit was byte_fallback
    blp = spark.sparkContext.broadcast(lp)
    mpl = max_piece_len

    def seg_types(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            segs, ns = [], []
            for word in pdf["word"]:
                seg = _viterbi_segment(word, blp.value, mpl, byte_lp=byte_lp)
                if seg is None:
                    seg = [word]  # OOV chars, no byte table: unsplit
                segs.append(" ".join(seg))
                ns.append(len(seg))
            yield pd.DataFrame(
                {"word": pdf["word"], "seg": segs, "np": ns}
            )

    wtypes = word_counts(docs, text_col).select("word")
    seg_map = wtypes.mapInPandas(seg_types, "word string, seg string, np int")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(tokens(text_col))
    ).select("doc_id", F.col("pos"), F.col("col").alias("word"))
    joined = toks.join(seg_map, "word")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("np").cast("long").alias("n_pieces"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("seg")))
                    ),
                    lambda s: s.getField("seg"),
                ),
            ).alias("encoded"),
        )
    )
