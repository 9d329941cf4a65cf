"""Benchmark harness — times the engine's headline queries.

Run: ``python bench.py``. Reads ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced with the noop sink (full computation, no driver
collect) — the measured time is scan + shuffle + agg, not
result-serialization.
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
    from play_with_pulsar_spark.queries import BENCH_QUERIES, REGISTRY
    from play_with_pulsar_spark.session import get_spark

    spark = get_spark(app_name="pwp-bench")

    # Each query is executed twice at the target scale and the MIN is
    # reported: the first run compiles the query's whole-stage-codegen
    # classes for the target-scale plan (AQE picks different join
    # strategies at different scales, so a small-scale warmup compiles
    # the wrong variant); the second run measures steady-state
    # execution — the number that projects to a long-lived cluster.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()  # drop operator-internal persists
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
