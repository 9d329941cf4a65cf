"""Benchmark harness — times the engine's headline queries.

Run: ``python bench.py``. Reads ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced with the noop sink (full computation, no driver
collect) — the measured time is scan + shuffle + agg, not
result-serialization.

Extra keys in the JSON line:
- ``fold_events_per_sec``: events folded per second in the
  fold_scale_replay entry (96k generated events incl. generation) —
  the fold-throughput number tracked round over round.
- ``sweep``: a 3-query subset timed at the SMALLER scale factors
  (sf0.001/sf0.01) so round-over-round scaling linearity is visible
  in one file. Skipped when the dirs don't exist or with
  ``SPARK_GRAFT_BENCH_SWEEP=0``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from play_with_pulsar_spark.queries import (
        BENCH_QUERIES,
        BENCH_WORKLOAD_NOTES,
        FOLD_SCALE_EVENTS_PER_ROOM,
        FOLD_SCALE_ROOMS,
        REGISTRY,
    )
    from play_with_pulsar_spark.session import get_spark

    spark = get_spark(app_name="pwp-bench")

    # Protocol: THREE full passes over the query list, min per query
    # across passes. Pass 1 absorbs whole-stage-codegen compilation
    # for the target-scale plans (AQE picks different strategies at
    # different scales, so a small-scale warmup would compile the
    # wrong variant). Reps are spread across passes rather than run
    # back-to-back so a transient stall (host CPU-steal burst, full
    # GC) cannot inflate all of one query's reps at once — this box
    # shows multi-second hypervisor steal in waves.
    timings: dict[str, float] = {}
    for _ in range(3):
        for name in BENCH_QUERIES:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            spark.catalog.clearCache()  # drop operator-internal persists
            timings[name] = round(min(timings.get(name, float("inf")), t), 3)

    total = round(sum(timings.values()), 3)

    # fold throughput: events generated+folded by fold_scale_replay
    fold_events_per_sec = None
    if timings.get("fold_scale_replay"):
        n_fold_events = FOLD_SCALE_ROOMS * FOLD_SCALE_EVENTS_PER_ROOM
        fold_events_per_sec = round(n_fold_events / timings["fold_scale_replay"], 1)

    # scaling sweep: a fast 3-query subset at the smaller SFs
    sweep: dict[str, dict[str, float]] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SWEEP", "1") != "0":
        subset = ["q1_pricing_summary", "a1_scoreboard_kills", "dedup_minhash_lsh"]
        base = os.path.dirname(sf_dir.rstrip("/"))
        for small_sf in ("0.001", "0.01"):
            d = os.path.join(base, f"sf{small_sf}")
            if not os.path.isdir(d) or d == sf_dir.rstrip("/"):
                continue
            sweep[small_sf] = {}
            for name in subset:
                fn = REGISTRY[name].fn
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                sweep[small_sf][name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "fold_events_per_sec": fold_events_per_sec,
                "sweep": sweep,
                # kept names whose WORKLOAD changed between rounds —
                # cross-round comparisons of these entries compare
                # different work, not engine improvements
                "workload_notes": {
                    k: v for k, v in BENCH_WORKLOAD_NOTES.items() if k in timings
                },
            }
        )
    )


if __name__ == "__main__":
    main()
