"""Round-13 optimization profiling: for each target query, dump
explain('formatted') to plans/r12/<name>_<tag>.txt and time N reps
with the noop sink (the bench methodology, single pass).

Usage: python scripts/profile_r12.py [tag] [query ...]
  tag defaults to 'before'; with no query names, runs the TOP list.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from play_with_pulsar_spark.queries import REGISTRY  # noqa: E402
from play_with_pulsar_spark.session import get_spark  # noqa: E402

TOP = [
    "graph_pagerank_copurchase",
    "mix_doremi_weights",
    "sim_opq_adc_topk",
    "mix_doremi_sample",
    "pipeline_fineweb_full",
    "text_excise_winnowed",
    "pipeline_fineweb_recipe",
    "dedup_survivors_quality",
    "dedup_embedding_lsh",
    "audit_dup_rate_by_source",
    "dedup_incremental_minhash",
    "text_bpe_merges",
    "text_gopher_repetition",
    "sim_ivf_pq_topk",
    "dedup_simhash_rotated",
    "text_line_dedup",
    "dedup_simhash_checked",
    "dsir_hashed_topk",
    "dedup_minhash_lsh",
    "quality_classifier_scores",
]

REPS = int(os.environ.get("PROFILE_REPS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TOP
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="pwp-profile-r13")
    results = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # build once for the plan dump (plan build may run allowlisted
        # fit jobs; keep that out of the first timed rep by building
        # a fresh plan per rep, exactly like bench.py does)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        spark.catalog.clearCache()
        ts = []
        if REPS == 0:
            print(f"{name}: plan dumped", flush=True)
            continue
        for _ in range(REPS):
            t0 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            ts.append((round(t2 - t0, 3), round(t1 - t0, 3), round(t2 - t1, 3)))
            spark.catalog.clearCache()
        results[name] = ts
        print(f"{name}: {ts}", flush=True)
    print("== summary (total / build / exec, min-total rep) ==")
    for k, v in results.items():
        best = min(v, key=lambda t: t[0])
        print(f"{best[0]:8.3f}  build={best[1]:7.3f} exec={best[2]:7.3f}  {k}")


if __name__ == "__main__":
    main()
