"""Pure-python golden generator for the unigram-LM tokenizer queries
(``text_unigram_pieces`` / ``text_unigram_encode``) — the fold-family
committed-golden protocol: an INDEPENDENT single-threaded
implementation of the same hard-EM algorithm, computed from the
sf0.01 ``documents`` fixture (the driver's correctness SF) and
written to ``fixtures/``. The distributed trainer must match these
files byte for byte (pinned in test_tokenizer.py and by the driver's
oracle compare).

Run: python scripts/gen_unigram_golden.py
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
VOCAB_SIZE, MAX_PIECE_LEN, ITERS, ROUND_TO = 60, 4, 2, 9
# round 10 — Kudo 2018 §3.2 pruning schedule: seed LARGER than the
# target, shrink by likelihood loss each round (exact vocab on the
# last); None = seed straight at VOCAB_SIZE (round-9 behavior)
SEED_SIZE, PRUNE_FRAC = 150, 0.2


def tokenize(t: str) -> list[str]:
    # the engine's tokens(): split(trim(lower(text)), r"\s+")
    return re.split(r"\s+", (t or "").strip().lower())


BYTE_PIECE_LP = -20.0  # mirrors tokenizer.BYTE_PIECE_LP
# planted suffix with characters OUTSIDE the corpus alphabet (é/ß are
# 2-byte UTF-8, € is 3-byte — the multi-byte decomposition must fire)
BF_SUFFIX = " né€on ße"


def byte_pieces(ch: str) -> list:
    return [f"<0x{b:02X}>" for b in ch.encode("utf-8")]


def viterbi(word: str, lp: dict, max_len: int, byte_lp=None):
    n = len(word)
    best = [None] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    fb = [False] * (n + 1)
    for pos in range(1, n + 1):
        b, bl, bf = None, 0, False
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
    out, pos = [], n
    while pos > 0:
        length = back[pos]
        if fb[pos]:
            out.extend(reversed(byte_pieces(word[pos - 1])))
        else:
            out.append(word[pos - length : pos])
        pos -= length
    out.reverse()
    return out


def alt_logprob(piece: str, lp: dict, max_len: int):
    """Best segmentation of ``piece`` WITHOUT the full-span piece —
    the Kudo §3.2 loss denominator (mirrors tokenizer._alt_logprob)."""
    n = len(piece)
    best = [None] * (n + 1)
    best[0] = 0.0
    for pos in range(1, n + 1):
        b = None
        for length in range(1, min(max_len, pos) + 1):
            if length == n:
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


def prune(counts: dict, lp: dict, max_len: int, target_total: int) -> dict:
    """Keep top-loss multi pieces to target_total; alphabet never
    prunes (mirrors tokenizer._prune_pieces)."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = [p for p in counts if len(p) > 1]
    k_keep = max(0, target_total - len(chars))
    if len(multi) <= k_keep:
        return counts
    losses = []
    for p in multi:
        alt = alt_logprob(p, lp, max_len)
        loss = float("inf") if alt is None else counts[p] * (lp[p] - alt)
        losses.append((p, loss))
    losses.sort(key=lambda t: (-t[1], t[0]))
    kept = dict(chars)
    for p, _ in losses[:k_keep]:
        kept[p] = counts[p]
    return kept


def train(word_cnt: dict[str, int], trace: list | None = None):
    seed: Counter = Counter()
    for w, c in word_cnt.items():
        for i in range(len(w)):
            for L in range(1, min(MAX_PIECE_LEN, len(w) - i) + 1):
                seed[w[i : i + L]] += c
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    k_multi = max(0, (SEED_SIZE or VOCAB_SIZE) - len(chars))
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:k_multi]
    counts = dict(chars)
    counts.update(dict(multi))
    tot = sum(counts.values())
    lp = {p: round(math.log(c / tot), ROUND_TO) for p, c in counts.items()}
    for it in range(ITERS):
        agg: Counter = Counter()
        for w, c in word_cnt.items():
            seg = viterbi(w, lp, MAX_PIECE_LEN)
            if seg is None:
                continue
            for p in seg:
                agg[p] += c
        new_counts = dict(agg)
        for p in lp:
            if len(p) == 1:
                new_counts.setdefault(p, 1)  # alphabet floor
        tot = sum(new_counts.values())
        lp = {
            p: round(math.log(c / tot), ROUND_TO)
            for p, c in new_counts.items()
        }
        target = (
            VOCAB_SIZE
            if it == ITERS - 1
            else max(
                VOCAB_SIZE,
                math.ceil(len(new_counts) * (1.0 - PRUNE_FRAC)),
            )
        )
        if len(new_counts) > target:
            new_counts = prune(new_counts, lp, MAX_PIECE_LEN, target)
            tot = sum(new_counts.values())
            lp = {
                p: round(math.log(c / tot), ROUND_TO)
                for p, c in new_counts.items()
            }
        if trace is not None:
            trace.append(len(lp))
    return lp


def main() -> None:
    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = list(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    word_cnt: Counter = Counter()
    doc_words = {}
    for did, text in rows:
        ws = tokenize(text)
        doc_words[did] = ws
        word_cnt.update(ws)
    lp = train(dict(word_cnt))
    pieces = sorted(lp.items())
    pq.write_table(
        pa.table(
            {
                "piece": [p for p, _ in pieces],
                "logprob": [v for _, v in pieces],
            }
        ),
        os.path.join(FIXDIR, "unigram_pieces_golden.parquet"),
    )
    seg_cache = {}
    ids, nps, encs = [], [], []
    for did, ws in sorted(doc_words.items()):
        parts, np_ = [], 0
        for w in ws:
            if w not in seg_cache:
                seg_cache[w] = viterbi(w, lp, MAX_PIECE_LEN) or [w]
            s = seg_cache[w]
            parts.append(" ".join(s))
            np_ += len(s)
        ids.append(did)
        nps.append(np_)
        encs.append(" ".join(parts))
    pq.write_table(
        pa.table({"doc_id": ids, "n_pieces": nps, "encoded": encs}),
        os.path.join(FIXDIR, "unigram_encode_golden.parquet"),
    )

    # --- byte_fallback twin (round 11): the SAME learned table plus
    # the 256 reserved <0xNN> rows, encoding docs planted with
    # characters outside the corpus alphabet — every word must
    # segment (zero unsplit unknowns), the unseen chars as their
    # UTF-8 byte pieces
    lp_bf = dict(lp)
    for b in range(256):
        lp_bf[f"<0x{b:02X}>"] = BYTE_PIECE_LP
    seg_cache = {}
    ids, nps, encs = [], [], []
    for did, text in sorted(rows):
        planted = text + BF_SUFFIX if did % 4 == 0 else text
        parts, np_ = [], 0
        for w in tokenize(planted):
            if w not in seg_cache:
                s = viterbi(w, lp_bf, MAX_PIECE_LEN, byte_lp=BYTE_PIECE_LP)
                assert s is not None, w  # zero-unknown law
                seg_cache[w] = s
            s = seg_cache[w]
            parts.append(" ".join(s))
            np_ += len(s)
        ids.append(did)
        nps.append(np_)
        encs.append(" ".join(parts))
    pq.write_table(
        pa.table({"doc_id": ids, "n_pieces": nps, "encoded": encs}),
        os.path.join(FIXDIR, "unigram_encode_bytes_golden.parquet"),
    )
    print(f"pieces: {len(pieces)}; docs encoded: {len(ids)}")


if __name__ == "__main__":
    main()
