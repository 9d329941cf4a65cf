"""Winnowed-index growth probe for the incremental substring-dedup
screen (round-12 verdict task #6 — the round-3 minhash-probe
precedent applied to ``IncrementalSubstrDeduper``).

Two measurements:

1. **Index-size sensitivity of one batch** (the screen's operative
   cost at crawl cadence): ingest the sf0.1 corpus (1x) and a salted
   10x copy (the ``probe_dedup_scale`` construction — distinct token
   space per copy, so anchor structure replicates linearly) as the
   stored claimed-anchor index, then time ``process_batch`` of the
   SAME fixed probe batch against each. The per-batch movement is
   one (gh, g) anti-join whose index side is a two-narrow-column
   scan + exchange, so wall should grow well under 10x — the
   number quantifies the "O(batch) work, O(index) narrow scan"
   contract in the module docstring.

2. **Stored-index size**: anchors rows and parquet bytes at 1x and
   10x, against the ~2·len/(w+1) expectation (selection density ×
   corpus tokens) — the affordability claim the index makes vs the
   one-row-per-token exact form.

Run: python scripts/probe_substr_scale.py [--reps 3] [--copies 10]
Paste the table into ROADMAP.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE = "/root/testdata/sf0.1"


def _salted_docs(spark, copies: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    parts = []
    for k in range(copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", "$1_c" + str(k)).alias(
                    "text"
                ),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    return big


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def probe(spark, copies: int, reps: int) -> None:
    from pyspark.sql import functions as F

    from play_with_pulsar_spark.streaming.substr_dedup import (
        IncrementalSubstrDeduper,
    )

    # the fixed probe batch: 500 fresh docs salted with a tag no
    # index copy uses, re-idded clear of every copy band
    probe_batch = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .select("doc_id", "text")
        .limit(500)
        .select(
            (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", "$1_probe").alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    rows = []
    for tag, n_copies in (("1x", 1), (f"{copies}x", copies)):
        base = tempfile.mkdtemp(prefix=f"pwp_substrprobe_{tag}_")
        try:
            d = IncrementalSubstrDeduper(spark, base, n=5, w=8)
            t0 = time.perf_counter()
            d.process_batch(_salted_docs(spark, n_copies), 0)
            t_ingest = time.perf_counter() - t0
            d.compact()
            idx = d._index()
            n_anchors = idx.count()
            idx_bytes = _dir_bytes(d.compacted_dir)
            best = float("inf")
            for r in range(reps):
                # a fresh batch id each rep: committed ids replay-skip
                t0 = time.perf_counter()
                d.process_batch(probe_batch, 1 + r)
                best = min(best, time.perf_counter() - t0)
            rows.append((tag, t_ingest, n_anchors, idx_bytes, best))
        finally:
            shutil.rmtree(base, ignore_errors=True)
    print(f"{'index':6s} {'ingest s':>9s} {'anchors':>10s} "
          f"{'idx MiB':>8s} {'batch s':>8s}")
    for tag, ti, na, ib, tb in rows:
        print(f"{tag:6s} {ti:9.1f} {na:10d} {ib / 2**20:8.2f} {tb:8.2f}")
    r0, r1 = rows
    print(f"probe-batch wall ratio at {copies}x index: "
          f"{r1[4] / r0[4]:.2f}x; anchors ratio {r1[2] / r0[2]:.2f}x; "
          f"bytes/anchor {r1[3] / r1[2]:.1f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from play_with_pulsar_spark.session import get_spark

    spark = get_spark(app_name="substr-scale-probe")
    probe(spark, args.copies, args.reps)


if __name__ == "__main__":
    main()
