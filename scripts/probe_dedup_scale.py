"""Scale-linearity probe for the dedup family (round-6 verdict task).

Builds a one-off 10x corpus from the sf0.1 fixtures — each copy k
re-ids its docs (doc_id + k*10^7) and SALTS every token with the copy
tag, so shingles are distinct across copies and the near-dup pair
structure replicates LINEARLY (10x the within-copy pairs, no cross-
copy pairs; replicating raw text instead would square the pair count
and change the problem). Embeddings get fresh seeded Gaussian vectors
per copy (adding noise to existing vectors would create quadratic
cross-copy near-dup pairs).

Then times dedup_minhash_lsh / dedup_incremental_minhash /
dedup_embedding_lsh on the base dir and the 10x dir (min of N reps,
warm session) and prints a table for ROADMAP. Near-linear plans
should show a 1x→10x wall ratio well under 10 plus the per-stage
floor; superlinearity here files a round-7 task.

Run: python scripts/probe_dedup_scale.py [--reps 3] [--copies 10]
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
QUERIES = ["dedup_minhash_lsh", "dedup_incremental_minhash", "dedup_embedding_lsh"]


def build_10x(spark, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for k in range(copies):
        tag = f"c{k}"
        # salt every token: "tok" -> "tok_c<k>" via regex on non-space
        # runs — same token count and gram count per doc, disjoint
        # shingle space per copy
        salted = docs.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", "$1_" + tag).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        parts.append(salted)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    eparts = [emb]
    for k in range(1, copies):
        # fresh seeded vectors per extra copy (rand with fixed seed per
        # copy; the exact distribution only needs to keep near-dup
        # density comparable, not match the fixture's)
        fresh = (
            spark.range(n)
            .select(
                (F.col("id") + F.lit(k * 10_000_000)).alias("vec_id"),
                F.array(
                    *[
                        (F.rand(seed=k * 1000 + j) * 2 - 1).cast("float")
                        for j in range(dim)
                    ]
                ).alias("embedding"),
                (F.col("id") % 8).cast("int").alias("label"),
            )
        )
        eparts.append(fresh)
    bige = eparts[0]
    for p in eparts[1:]:
        bige = bige.unionByName(p)
    bige.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def time_queries(spark, sf_dir: str, reps: int) -> dict[str, float]:
    from play_with_pulsar_spark.queries import REGISTRY

    out = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--queries", default=None,
                    help="comma-separated query names (default: dedup family)")
    ap.add_argument("--no-auto", action="store_true",
                    help="skip the embedding auto-geometry comparison")
    args = ap.parse_args()

    from play_with_pulsar_spark.session import get_spark

    global QUERIES
    if args.queries:
        QUERIES = args.queries.split(",")
    spark = get_spark(app_name="dedup-scale-probe")
    tmp = tempfile.mkdtemp(prefix="pwp_scale10x_")
    try:
        t0 = time.perf_counter()
        build_10x(spark, tmp, args.copies)
        print(f"built {args.copies}x corpus in {time.perf_counter() - t0:.1f}s at {tmp}")
        base = time_queries(spark, BASE, args.reps)
        big = time_queries(spark, tmp, args.reps)
        print(f"{'query':35s} {'1x sec':>8s} {f'{args.copies}x sec':>8s} {'ratio':>6s}")
        for name in QUERIES:
            r = big[name] / base[name] if base[name] else float("nan")
            print(f"{name:35s} {base[name]:8.3f} {big[name]:8.3f} {r:6.2f}")

        if args.no_auto:
            return
        # the embedding query with AUTO-SCALED geometry at both sizes:
        # fixed 8-plane geometry goes superlinear (bucket occupancy ~
        # N/2^planes), the log2(N)-scaled geometry restores ~linear
        from play_with_pulsar_spark.operators import dedup, similarity

        def emb_auto(sf_dir: str) -> float:
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n = emb.count()
            planes, tables = similarity.lsh_auto_geometry(n, threshold=0.9,
                                                          target_recall=0.9)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                res = dedup.embedding_cosine_pairs_lsh(
                    emb, dim=64, threshold=0.9,  # the near-dup regime LSH is for
                    num_planes=planes, num_tables=tables,
                )
                res.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                dedup.release_intermediates(res)
                spark.catalog.clearCache()
            print(f"  auto geometry ({planes} planes, {tables} tables): {best:.3f}s")
            return best

        print("dedup_embedding_lsh, lsh_auto_geometry:")
        b1 = emb_auto(BASE)
        b10 = emb_auto(tmp)
        print(f"{'dedup_embedding_lsh[auto]':35s} {b1:8.3f} {b10:8.3f} {b10 / b1:6.2f}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
