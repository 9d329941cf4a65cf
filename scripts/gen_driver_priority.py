"""Regenerate ``queries._DRIVER_PRIORITY`` for the next driver round.

The external driver records CORRECTNESS rows for the FIRST 50
``queries()`` entries only, so the list must rotate: names never yet
sampled first (the current round's additions), then every
previously-sampled name STALEST-FIRST by its last CORRECTNESS_r0N
appearance. Run at round end, paste the output block over the list in
``queries.py`` (the sync test in test_oracle_parity pins membership,
not order).

Usage: python scripts/gen_driver_priority.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Names FORCED into the top of the sample this round regardless of
# staleness — queries whose operators changed with thin driver-side
# coverage (round 13: the r12 post-bench trio's consumers, per the
# r12 verdict item 3, plus this round's heaviest-touched entries).
PINNED = [
    "sim_opq_adc_topk",
    "sim_opq_stored",
    "dedup_survivors_quality",
    "audit_dup_rate_by_source",
    "split_leakage_safe",
    "dedup_simhash_rotated",
    "dedup_simhash_checked",
    "dedup_incremental_simhash",
    "dedup_exact_substring",
    "dedup_ngram_jaccard",
    "graph_pagerank_copurchase",
    "sim_ivf_pq_topk",
    "text_bpe_merges",
    "text_unigram_logprob",
    "text_gopher_repetition",
    "pipeline_fineweb_full",
    "pipeline_fineweb_recipe",
    "text_html_main_content",
    "text_excise_winnowed",
]


def main() -> None:
    from play_with_pulsar_spark import queries as q

    names = list(q.queries().keys())
    last: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            for k in json.load(f):
                last[k] = max(last.get(k, 0), rnd)
    pinned = [n for n in PINNED if n in names]
    rest = [n for n in names if n not in pinned]
    never = [n for n in rest if n not in last]
    stale = sorted((n for n in rest if n in last), key=lambda n: (last[n], n))
    print(f"# pinned: {len(pinned)}; never sampled: {len(never)}; sampled: {len(stale)}")
    print("_DRIVER_PRIORITY = [")
    print("    # round-13 pins first (changed operators needing driver-side")
    print("    # verification), then never-driver-sampled names, then every")
    print("    # previously-sampled name stalest-first by last")
    print("    # CORRECTNESS_r0N appearance (gen_driver_priority.py)")
    for n in pinned:
        print(f'    "{n}",  # pinned')
    for n in never:
        print(f'    "{n}",')
    for n in stale:
        print(f'    "{n}",  # r{last[n]}')
    print("]")


if __name__ == "__main__":
    main()
