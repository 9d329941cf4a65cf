"""BPE tokenizer training (operators/tokenizer.py) — the distributed
merge learner against an independent pure-python reference, plus the
greedy-rewrite edge cases and the encode step."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from play_with_pulsar_spark.operators import tokenizer as tk


# --- independent reference implementation (single-threaded) ---------


def ref_bpe(texts: list[str], num_merges: int):
    """Reference BPE trainer: word counts once, then per-iteration
    pair counts over types + greedy leftmost non-overlapping rewrite.
    Ties break by (count DESC, lhs ASC, rhs ASC)."""
    wc = Counter(w for t in texts for w in t.strip().lower().split())
    vocab = {w: list(w) for w in wc}
    merges = []
    for k in range(1, num_merges + 1):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        mx = max(pc.values())
        if mx < 2:
            break
        x, y = min(p for p, c in pc.items() if c == mx)
        merges.append((k, x, y, x + y, mx))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_reference_on_fixed_corpus(spark):
    texts = ["aaaaa banana banana x", "aaaaa bandana low lower lowest", "low low newer new"]
    got = [tuple(r) for r in tk.bpe_learn_merges(_docs(spark, texts), 6).collect()]
    want, _ = ref_bpe(texts, 6)
    assert got == want


def test_overlap_pair_merges_greedy_leftmost(spark):
    # pair (a, a) over 'aaaaa': greedy leftmost -> aa aa a, so after
    # merge 1 the (aa, aa) pair count is word count, not zero.
    texts = ["aaaaa aaaaa aaaaa"]
    got = [tuple(r) for r in tk.bpe_learn_merges(_docs(spark, texts), 3).collect()]
    want, _ = ref_bpe(texts, 3)
    assert got == want
    assert got[0][1:4] == ("a", "a", "aa")


def test_early_stop_when_no_repeated_pair(spark):
    # every word unique, every pair count 1 -> zero merges learned
    got = tk.bpe_learn_merges(_docs(spark, ["ab cd ef"]), 4).collect()
    assert got == []


def test_single_char_words_survive(spark):
    texts = ["a a a b b ab ab"]
    got = [tuple(r) for r in tk.bpe_learn_merges(_docs(spark, texts), 2).collect()]
    want, _ = ref_bpe(texts, 2)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    corpus=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    k=st.integers(min_value=1, max_value=3),
)
def test_matches_reference_hypothesis(spark, corpus, k):
    got = [tuple(r) for r in tk.bpe_learn_merges(_docs(spark, corpus), k).collect()]
    want, _ = ref_bpe(corpus, k)
    assert got == want


def test_apply_bpe_reproduces_trained_vocab(spark):
    """Encoding the training corpus with the learned merge table must
    reproduce the trainer's final symbol sequences word-for-word —
    the train/encode consistency law of BPE."""
    texts = ["aaaaa banana banana x", "aaaaa bandana low lower lowest"]
    d = _docs(spark, texts)
    merges = [(r["lhs"], r["rhs"]) for r in tk.bpe_learn_merges(d, 5).collect()]
    _, vocab = ref_bpe(texts, 5)
    enc = {
        r["doc_id"]: r["bpe_tokens"]
        for r in tk.apply_bpe(d, merges).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in vocab[w]]
        assert enc[i] == want


def test_apply_bpe_is_pure_projection(spark):
    """The encode step must not add exchanges or Python workers: it
    rides inside the scan stage at any scale."""
    d = _docs(spark, ["aa aa ab"])
    plan = tk.apply_bpe(d, [("a", "a"), ("aa", "b")])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_word_counts_is_corpus_agg_only(spark):
    d = _docs(spark, ["x y x"])
    rows = {(r["word"], r["cnt"]) for r in tk.word_counts(d).collect()}
    assert rows == {("x", 2), ("y", 1)}


def ref_wordpiece(texts: list[str], num_merges: int):
    """Reference WordPiece trainer: the ref_bpe loop with the winner
    chosen by score = c / (count(lhs) * count(rhs)), ties by
    (lhs, rhs); same c >= 2 floor and greedy rewrite."""
    wc = Counter(w for t in texts for w in t.strip().lower().split())
    vocab = {w: list(w) for w in wc}
    merges = []
    for k in range(1, num_merges + 1):
        pc: Counter = Counter()
        uc: Counter = Counter()
        for w, syms in vocab.items():
            for s in syms:
                uc[s] += wc[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        cands = [
            (c / (uc[p[0]] * uc[p[1]]), p, c) for p, c in pc.items() if c >= 2
        ]
        if not cands:
            break
        # deterministic: max score, then lexicographically SMALLEST pair
        top_score = max(t[0] for t in cands)
        tied = sorted(p for s, p, c in cands if s == top_score)
        x, y = tied[0]
        c = pc[(x, y)]
        merges.append((k, x, y, x + y, c, c / (uc[x] * uc[y])))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_wordpiece_matches_reference_and_differs_from_bpe(spark):
    """The likelihood score is load-bearing: on a corpus where the
    most FREQUENT pair is not the most above-chance one, WordPiece
    and BPE learn different tables; the Spark fit equals the pure
    python reference exactly (score included — one IEEE division)."""
    texts = [
        "aaaaa banana banana x qu qu ququ",
        "aaaaa bandana low lower lowest",
        "low low newer new quick quick",
    ]
    got = [tuple(r) for r in tk.wordpiece_learn_merges(_docs(spark, texts), 6).collect()]
    want = ref_wordpiece(texts, 6)
    assert got == want
    bpe = [tuple(r)[:3] for r in tk.bpe_learn_merges(_docs(spark, texts), 6).collect()]
    assert [g[:3] for g in got] != bpe


def test_wordpiece_early_stop(spark):
    texts = ["a b c d", "e f g h"]  # no pair reaches count 2
    got = tk.wordpiece_learn_merges(_docs(spark, texts), 4).collect()
    assert got == []


# Unigram-LM tokenizer (round 9 — Kudo 2018, hard-EM variant)


def _unigram_ref():
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import gen_unigram_golden as G

    return G


def test_unigram_trainer_matches_pure_python_reference(spark):
    """The distributed trainer equals the independent pure-python
    implementation (the golden generator) on corpora with genuine
    segmentation ambiguity, and the structural laws hold: alphabet
    always present, multi-char pieces self-prune, every word
    reconstructs from its segmentation."""
    from play_with_pulsar_spark.operators import tokenizer

    G = _unigram_ref()
    corpora = [
        ["banana bandana ana nab " * 3, "banana anab nana", "dana ban ana"],
        ["aaa aa a aaaa " * 2, "ab ba aab baa abab"],
        ["the cat sat on the mat", "the mat sat on the cat", "cats mats"],
    ]
    for texts in corpora:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.piece: r.logprob
            for r in tokenizer.unigram_learn_pieces(
                docs, vocab_size=20, max_piece_len=3, iters=2
            ).collect()
        }
        from collections import Counter

        wc = Counter()
        for t in texts:
            wc.update(G.tokenize(t))
        G.VOCAB_SIZE, G.MAX_PIECE_LEN, G.ITERS = 20, 3, 2
        G.SEED_SIZE, G.PRUNE_FRAC = None, 0.2  # legacy path, no schedule
        want = G.train(dict(wc))
        assert got == want, (texts[0][:30], got, want)
        # laws: alphabet floor, pruning, reconstruction
        chars = {c for w in wc for c in w}
        assert chars <= set(got)
        for w in wc:
            seg = G.viterbi(w, want, 3)
            assert seg is not None and "".join(seg) == w


def test_unigram_pruning_schedule_laws(spark):
    """Round 10 — Kudo 2018 §3.2: seed LARGER than the target, prune
    by likelihood loss per round. Laws: (a) the per-round model size
    is monotone non-increasing and lands <= vocab_size on the last
    round, (b) the alphabet never prunes, (c) the distributed trainer
    equals the pure-python reference under the schedule, (d) seeding
    below vocab_size raises."""
    from collections import Counter

    import pytest as _pytest

    from play_with_pulsar_spark.operators import tokenizer

    G = _unigram_ref()
    texts = [
        "banana bandana ana nab " * 3,
        "banana anab nana cabana",
        "dana ban ana banana band",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    trace: list = []
    got = {
        r.piece: r.logprob
        for r in tokenizer.unigram_learn_pieces(
            docs, vocab_size=12, max_piece_len=3, iters=3,
            seed_size=40, prune_frac=0.3, trace=trace,
        ).collect()
    }
    assert len(trace) == 3
    assert all(a >= b for a, b in zip(trace, trace[1:])), trace  # monotone
    assert trace[0] < 40  # pruning actually fired on round 1
    assert trace[-1] <= 12 and len(got) == trace[-1]
    wc = Counter()
    for t in texts:
        wc.update(G.tokenize(t))
    chars = {c for w in wc for c in w}
    assert chars <= set(got)  # alphabet never prunes
    G.VOCAB_SIZE, G.MAX_PIECE_LEN, G.ITERS = 12, 3, 3
    G.SEED_SIZE, G.PRUNE_FRAC = 40, 0.3
    ref_trace: list = []
    want = G.train(dict(wc), trace=ref_trace)
    assert got == want
    assert trace == ref_trace
    with _pytest.raises(ValueError):
        tokenizer.unigram_learn_pieces(docs, vocab_size=12, seed_size=5)


def test_unigram_goldens_in_sync_with_generator():
    """Committed goldens == a fresh pure-python recomputation from the
    sf0.01 fixture (the fold-family sync gate)."""
    import os

    import pyarrow.parquet as pq

    G = _unigram_ref()
    G.VOCAB_SIZE, G.MAX_PIECE_LEN, G.ITERS = 60, 4, 2
    G.SEED_SIZE, G.PRUNE_FRAC = 150, 0.2  # the committed query params
    from collections import Counter

    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    wc = Counter()
    dw = {}
    for did, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        ws = G.tokenize(t)
        dw[did] = ws
        wc.update(ws)
    lp = G.train(dict(wc))
    fixdir = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    gp = pq.read_table(os.path.join(fixdir, "unigram_pieces_golden.parquet"))
    assert sorted(lp.items()) == list(
        zip(gp["piece"].to_pylist(), gp["logprob"].to_pylist())
    )
    ge = pq.read_table(os.path.join(fixdir, "unigram_encode_golden.parquet"))
    want_enc = dict(
        zip(ge["doc_id"].to_pylist(), ge["encoded"].to_pylist())
    )
    for did, ws in list(dw.items())[:50]:
        parts = []
        for w in ws:
            parts.append(" ".join(G.viterbi(w, lp, 4) or [w]))
        assert " ".join(parts) == want_enc[did], did


def test_unigram_encode_consistency(spark):
    """Encode laws on the fixture: n_pieces == the piece count of the
    encoded string, every emitted piece is in the final table, and
    stripping the spaces reconstructs the tokenized document."""
    from play_with_pulsar_spark.operators import tokenizer
    from play_with_pulsar_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    pieces = tokenizer.unigram_learn_pieces(d)
    vocab = {r.piece for r in pieces.collect()}
    rows = tokenizer.unigram_encode(d, pieces).collect()
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    assert len(rows) == len(texts)
    for r in rows[:100]:
        ps = r.encoded.split(" ")
        assert r.n_pieces == len(ps)
        assert set(ps) <= vocab
        assert "".join(ps) == "".join(
            texts[r.doc_id].strip().lower().split()
        )


def test_unigram_byte_fallback_laws(spark):
    """The SentencePiece byte_fallback contract (round 11):

    - learned rows are BIT-IDENTICAL to the plain fit (training never
      sees byte tokens); the 256 <0xNN> rows ride at BYTE_PIECE_LP;
    - every word segments — zero unsplit unknowns — with unseen
      characters decomposed to their UTF-8 byte pieces (multi-byte
      chars included), and the bytes decode back to the character;
    - in-alphabet words segment EXACTLY as without the fallback (the
      fallback exists only for unseen characters)."""
    from play_with_pulsar_spark.operators import tokenizer
    from play_with_pulsar_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    plain = tokenizer.unigram_learn_pieces(d)
    bf = tokenizer.unigram_learn_pieces(d, byte_fallback=True)
    prows = {(r.piece, r.logprob) for r in plain.collect()}
    brows = {(r.piece, r.logprob) for r in bf.collect()}
    byte_rows = {p for p, _ in brows} - {p for p, _ in prows}
    assert byte_rows == {f"<0x{b:02X}>" for b in range(256)}
    assert prows == {
        (p, v) for p, v in brows if not p.startswith("<0x")
    }
    assert all(
        v == tokenizer.BYTE_PIECE_LP for p, v in brows if p.startswith("<0x")
    )

    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" né€on ße")),
        ).otherwise(F.col("text")).alias("text"),
    )
    rows = tokenizer.unigram_encode(planted, bf).collect()
    texts = {
        r.doc_id: r.text for r in planted.select("doc_id", "text").collect()
    }
    vocab = {p for p, _ in brows}
    import re as _re

    def _decode(ps):
        out, buf = [], b""
        for p in ps:
            m = _re.fullmatch(r"<0x([0-9A-F]{2})>", p)
            if m:
                buf += bytes([int(m.group(1), 16)])
            else:
                out.append(buf.decode("utf-8")); buf = b""
                out.append(p)
        out.append(buf.decode("utf-8"))
        return "".join(out)

    hit = 0
    for r in rows:
        ps = r.encoded.split(" ")
        assert r.n_pieces == len(ps)
        assert set(ps) <= vocab  # ZERO unsplit unknowns
        want = "".join(texts[r.doc_id].strip().lower().split())
        assert _decode(ps) == want  # byte pieces decode back exactly
        if r.doc_id % 4 == 0:
            assert "<0xE2>" in ps and "<0x82>" in ps and "<0xAC>" in ps  # €
            hit += 1
    assert hit > 0

    # in-alphabet segmentation identical with and without the table
    clean = tokenizer.unigram_encode(d, bf).collect()
    base = tokenizer.unigram_encode(d, plain).collect()
    assert {(r.doc_id, r.encoded) for r in clean} == {
        (r.doc_id, r.encoded) for r in base
    }
