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
    never = [n for n in names if n not in last]
    stale = sorted((n for n in names if n in last), key=lambda n: (last[n], n))
    print(f"# never sampled: {len(never)}; sampled: {len(stale)}")
    print("_DRIVER_PRIORITY = [")
    print("    # never-driver-sampled names first (this round's additions),")
    print("    # then every previously-sampled name stalest-first by last")
    print("    # CORRECTNESS_r0N appearance (gen_driver_priority.py)")
    for n in never:
        print(f'    "{n}",')
    for n in stale:
        print(f'    "{n}",  # r{last[n]}')
    print("]")


if __name__ == "__main__":
    main()
