"""Session-2 parity probe for the round-13 job-structure changes:
hash-compare every affected declared query against DuckDB at
sf0.001 and sf0.01 (the driver-gate replica).

Usage: python scripts/parity_s2.py [name ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from play_with_pulsar_spark import parity  # noqa: E402
from play_with_pulsar_spark.queries import REGISTRY  # noqa: E402
from play_with_pulsar_spark.session import get_spark  # noqa: E402

AFFECTED = [
    # A: dedup_clusters job fusion
    "dedup_clusters_exact",
    "audit_dup_rate_by_source",
    "dedup_survivors_quality",
    "dedup_survivors",
    "split_leakage_safe",
    # C: classifier single-tokenization persist
    "quality_classifier_scores",
    "pipeline_quality_dedup",
    # B: lazy initial vocab checkpoint
    "text_bpe_merges",
    "text_bpe_encode",
    "text_wordpiece_merges",
    # D: seed piece-count persist
    "text_unigram_pieces",
    "text_unigram_encode",
    "text_unigram_encode_bytes",
]


def main() -> None:
    names = sys.argv[1:] or AFFECTED
    spark = get_spark(app_name="pwp-parity-s2")
    bad = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            q = REGISTRY[name]
            if q.oracle is None:
                # rows-only probe
                n = q.fn(spark, sf_dir).count()
                print(f"{sf_dir.split('/')[-1]} {name}: rows={n} (no oracle)", flush=True)
                continue
            r = parity.compare(name, spark, sf_dir, q.fn, q.oracle)
            print(f"{sf_dir.split('/')[-1]} {r.detail}", flush=True)
            if not r.ok:
                bad.append((sf_dir, name))
        spark.catalog.clearCache()
    if bad:
        print("FAILURES:", bad)
        sys.exit(1)
    print("ALL GREEN")


if __name__ == "__main__":
    main()
