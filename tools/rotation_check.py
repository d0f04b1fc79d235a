"""Driver-window rotation audit.

The grading driver samples the FIRST 50 registry entries each round
(suites/__init__.DRIVER_PRIORITY orders them). This tool recomputes, from
the committed CORRECTNESS_r{N}.json files, each query's newest driver row
and reports:

- the staleness histogram (newest row per round);
- which stale queries the CURRENT window would re-earn a row for;
- stale queries the window misses (candidates for the next rotation);
- registry entries that have never had a driver row.

Usage: python tools/rotation_check.py
Exit code 1 if any query's newest driver row is older than (current max
round - 2) AND it is not in the current window — the "rotation debt"
condition VERDICT r04 flagged.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

WINDOW = 50

# §2.A flagship tier (VERDICT r08 #8): the reference's core search
# semantics (executor.py:73–125). These rows may never exceed 2 rounds
# driver-stale; a proposed window that would leave one of them older than
# (current max round - 2) without re-earning it fails the audit loudly.
# Round 8 proved the need — the missed rotation left the whole family 4
# rounds stale and only a manual judge re-check caught it.
FLAGSHIP = (
    "knn_search_cosine",
    "knn_search_euclidean",
    "knn_search_inner_product",
    "knn_search_batch1",
    "knn_search_batch8",
    "knn_search_batch64",
    "knn_search_batch512",
    "payload_fetch",
    "limit_clamp",
    "score_transform_similarity",
    "dim_validate",
    "clear",
)


def main() -> int:
    latest: dict[str, int] = {}
    rounds = []
    # anchored to the repo root, not cwd — from any other directory the
    # glob would match nothing and the audit would exit 0 without looking
    for path in sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    if not rounds:
        print("no CORRECTNESS_r*.json files found")
        return 0
    cur = max(rounds)

    from executor_u1mindexer_spark.suites import merged

    queries, _ = merged()
    window = list(queries)[:WINDOW]
    never = [n for n in queries if n not in latest]

    print(f"rounds seen: {sorted(set(rounds))}; registry: {len(queries)} queries")
    print("staleness histogram (newest driver row):", dict(sorted(Counter(latest.values()).items())))
    if never:
        print(f"never driver-checked ({len(never)}):", never)

    threshold = cur - 2
    stale = {n for n, r in latest.items() if r < threshold and n in queries}
    covered = sorted(stale & set(window))
    missed = sorted(stale - set(window))
    print(f"stale (< r{threshold:02d}): {len(stale)}; window re-earns {len(covered)}; missed {len(missed)}")
    rc = 0
    # Flagship tier guard: assuming the current window earns a row at
    # round cur+1, no flagship row may end up older than (cur+1) - 2.
    flagship_violations = sorted(
        n
        for n in FLAGSHIP
        if n not in window and latest.get(n, 0) < (cur + 1) - 2
    )
    if flagship_violations:
        print(
            "FLAGSHIP TIER VIOLATION (must be in the window this round):",
            flagship_violations,
        )
        rc = 1
    if missed:
        print("MISSED (put these first next round):", missed)
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
