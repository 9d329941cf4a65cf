"""Per-stage attribution for one query: run it once (warm) then again
with a job-description label, and dump each stage's executorRunTime /
task count / shuffle volumes from the UI REST API.

Usage: python scripts/profile_stages_s2.py <query> [reps]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from play_with_pulsar_spark.queries import REGISTRY  # noqa: E402
from play_with_pulsar_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pwp-stages", extra_conf={"spark.ui.enabled": "true"})
    fn = REGISTRY[name].fn
    for _ in range(reps):  # warm codegen/AQE
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    before = {
        s["stageId"]
        for s in json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
    }
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    new = [s for s in stages if s["stageId"] not in before]
    new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    tot_run = sum(s.get("executorRunTime") or 0 for s in new)
    print(f"wall {wall:.3f}s; {len(new)} stages, executorRunTime sum {tot_run} ms")
    for s in new[:30]:
        nm = (s.get("description") or s.get("name") or "")[:95]
        print(
            f"  {s.get('executorRunTime', 0):7d} ms run | {s.get('numCompleteTasks', 0):3d} tasks "
            f"| subm->done {s.get('status')} | shufR {s.get('shuffleReadBytes', 0):>9} "
            f"| shufW {s.get('shuffleWriteBytes', 0):>9} | {nm}"
        )
    # sequential latency picture: sort by submission time
    new.sort(key=lambda s: s.get("submissionTime") or "")
    print("-- timeline (submission order) --")
    for s in new[:40]:
        nm = (s.get("name") or "")[:60]
        print(
            f"  {s.get('submissionTime','')[11:23]} -> {s.get('completionTime','')[11:23]} "
            f"| {s.get('executorRunTime', 0):6d} ms | {s.get('numCompleteTasks', 0):3d}t | {nm}"
        )


if __name__ == "__main__":
    main()
