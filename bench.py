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

    # Warm up JVM/codegen on the smoke-scale data so the timed runs
    # measure the queries, not JIT compilation.
    for name in BENCH_QUERIES:
        try:
            REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
