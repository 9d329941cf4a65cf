"""Per-batch cost of the four curator screens (round 8) — one table
for ROADMAP: the same corpus split 80/20, the 80% ingested as the
seed batch, then the 20% batch timed through each screen (min of
--reps warm reps; state dirs rebuilt per rep so every rep pays the
same probe work).

Run: python scripts/probe_screen_costs.py [--reps 2] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from play_with_pulsar_spark.session import get_spark
    from play_with_pulsar_spark.sources.tables import load_table
    from play_with_pulsar_spark.streaming.curator import StreamingCorpusCurator

    spark = get_spark(app_name="pwp-screen-probe")
    docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 5 != 0).persist()
    batch = docs.filter(F.col("doc_id") % 5 == 0).persist()
    n_seed, n_batch = seed.count(), batch.count()
    print(f"seed {n_seed} docs, batch {n_batch} docs", flush=True)

    emb = load_table(spark, args.sf_dir, "embeddings")
    eseed = emb.filter(F.col("vec_id") % 5 != 0).persist()
    ebatch = emb.filter(F.col("vec_id") % 5 == 0).persist()
    eseed.count(), ebatch.count()

    screens = {
        "jaccard": dict(screen="jaccard", threshold=0.8, max_shingle_freq=50),
        "minhash": dict(screen="minhash", threshold=0.8, max_shingle_freq=None),
        "simhash": dict(screen="simhash", max_hamming=3),
        "embedding": dict(
            screen="embedding", emb_dim=64, threshold=0.9, id_col="vec_id"
        ),
        # round 9: the PQ state tier — same screen, 3.5x less state
        # than int8; the probe shows what the compression costs per
        # batch (encode is an in-scan projection, decode rides reads)
        "emb-pq": dict(
            screen="embedding", emb_dim=64, threshold=0.9, id_col="vec_id",
            vec_format="pq",
        ),
    }
    rows = []
    for name, kw in screens.items():
        s = eseed if name.startswith("emb") else seed
        b = ebatch if name.startswith("emb") else batch
        best_seed, best_batch = float("inf"), float("inf")
        for _ in range(args.reps):
            base = tempfile.mkdtemp(prefix=f"pwp_scr_{name}_")
            try:
                cur = StreamingCorpusCurator(spark, base, **kw)
                t0 = time.perf_counter()
                cur.process_batch(s, 0)
                t_seed = time.perf_counter() - t0
                t0 = time.perf_counter()
                cur.process_batch(b, 1)
                t_batch = time.perf_counter() - t0
                best_seed = min(best_seed, t_seed)
                best_batch = min(best_batch, t_batch)
            finally:
                shutil.rmtree(base, ignore_errors=True)
        rows.append((name, best_seed, best_batch))
        print(f"{name:10s} seed {best_seed:6.2f}s  batch {best_batch:6.2f}s", flush=True)

    print("\nscreen       seed-batch sec   probe-batch sec")
    for name, a, b in rows:
        print(f"{name:10s}   {a:10.2f}      {b:10.2f}")


if __name__ == "__main__":
    main()
