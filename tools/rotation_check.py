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

Exit criterion (amended r10, VERDICT r09 #1): with 160+ registry rows and
a 50-slot window, "zero stale rows" is structurally impossible while a
multi-round debt drains — the r08/r09 failure mode was never the
EXISTENCE of debt but a window that re-earned NOTHING (the at-rest tree
re-pointing the driver at freshly-checked rows). So the audit fails
(exit 1) iff the window WASTES slots.

A slot's legitimacy is judged against its STALENESS BASIS: the row's
newest driver round EXCLUDING the current round. The driver consumes the
committed window at round end, so right after a healthy round every
window row has latest == cur — indistinguishable, by latest alone, from
the r08 stall where the driver re-checked an already-fresh window. The
basis separates them: a window row whose previous row was old (or that
had never been checked) spent its slot re-earning debt (basis < cur-2 →
legitimate); one whose previous row was already fresh burned the slot
(basis >= cur-2 → wasted, unless declared in suites.POLICY_A, the
changed-this-round list — rotation policy (a)).

exit 1 iff:
  1. wasted slots exist while stale or never-checked rows wait outside
     the window; or
  2. the flagship tier guard fires (below); or
  3. the MAX_AGE cadence tripwire fires (r14, VERDICT r13 #4): assuming
     the committed window earns a row at cur+1, no checked registry row
     may end up older than (cur+1) - MAX_AGE. The cycle arithmetic
     behind MAX_AGE = 5 lives in the cadence policy comment in
     suites/__init__.py.

A maximally-rotated window with remaining debt exits 0 and prints the
queue so the next round's window is a copy-paste.
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

# Cadence bound (r14, VERDICT r13 #4): a checked row may never be more
# than MAX_AGE rounds driver-stale. 209 rows / ~44 effective re-earn
# slots per window = a 5-round cycle; the full arithmetic is written in
# the cadence policy comment (suites/__init__.py).
MAX_AGE = 5

# §2.A flagship tier (VERDICT r08 #8): the reference's core search
# semantics (executor.py:73–125). These rows may never exceed 2 rounds
# driver-stale; a proposed window that would leave one of them older than
# (current max round - 2) without re-earning it fails the audit loudly.
# Round 8 proved the need — the missed rotation left the whole family 4
# rounds stale and only a manual judge re-check caught it.
# r10: the four batch rows folded into the single parameterized
# knn_search_batch twin (VERDICT r09 #3).
FLAGSHIP = (
    "knn_search_cosine",
    "knn_search_euclidean",
    "knn_search_inner_product",
    "knn_search_batch",
    "payload_fetch",
    "limit_clamp",
    "score_transform_similarity",
    "dim_validate",
    "clear",
)


def main() -> int:
    latest: dict[str, int] = {}
    rounds_by_name: dict[str, set[int]] = {}
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
            rounds_by_name.setdefault(name, set()).add(rnd)
    if not rounds:
        print("no CORRECTNESS_r*.json files found")
        return 0
    cur = max(rounds)

    def basis(name: str) -> int:
        """Staleness basis: newest driver round EXCLUDING the current one
        (0 = never checked before cur). See the module docstring."""
        prior = [r for r in rounds_by_name.get(name, ()) if r != cur]
        return max(prior, default=0)

    import executor_u1mindexer_spark.suites as suites

    queries, _ = suites.merged()
    policy_a = set(getattr(suites, "POLICY_A", ()))
    window = list(queries)[:WINDOW]
    never = [n for n in queries if n not in latest]

    print(f"rounds seen: {sorted(set(rounds))}; registry: {len(queries)} queries")
    print(
        "staleness histogram (newest driver row, 0=never):",
        dict(sorted(Counter(latest.get(n, 0) for n in queries).items())),
    )
    if never:
        print(f"never driver-checked ({len(never)}):", never)

    threshold = cur - 2
    stale = {n for n, r in latest.items() if r < threshold and n in queries}
    covered = sorted(stale & set(window))
    missed = sorted(stale - set(window))
    never_missed = sorted(set(never) - set(window))
    # wasted = slots whose staleness BASIS (pre-cur) was already fresh:
    # the slot neither re-earned debt nor first-checked a new row nor
    # covered a declared change. Amended late r12: a flagship row the
    # tier guard itself FORCES into this window (latest < (cur+1)-2,
    # i.e. removing it would trip the guard below) cannot also count as
    # a wasted slot — before this amendment, adding any new registry
    # row after the window closed flipped the mandated flagship block
    # to "wasted" and the audit to exit 1, making late-round growth
    # structurally impossible even though every displaceable slot was
    # legitimately occupied. Mandated-but-fresh flagship rows (basis >=
    # threshold AND not guard-forced) still count.
    mandated = {n for n in FLAGSHIP if latest.get(n, 0) < (cur + 1) - 2}
    wasted = [
        n
        for n in window
        if basis(n) >= threshold and n not in policy_a and n not in mandated
    ]
    print(
        f"stale (< r{threshold:02d}): {len(stale)}; window re-earns "
        f"{len(covered)}; missed {len(missed)}; never outside window "
        f"{len(never_missed)}; wasted slots {len(wasted)}"
    )
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
    # MAX_AGE cadence tripwire: like the flagship guard, judged on the
    # assumption the committed window earns its rows at cur+1. Never-
    # checked rows are excluded (they queue per the growth policy and
    # the wasted-slot rule already polices them).
    age_violations = sorted(
        n
        for n in queries
        if n not in window and 0 < latest.get(n, 0) < (cur + 1) - MAX_AGE
    )
    if age_violations:
        print(
            f"MAX_AGE CADENCE VIOLATION (older than cur+1-{MAX_AGE} and "
            "not in the window):",
            age_violations,
        )
        rc = 1
    if wasted and (missed or never_missed):
        print(
            "WASTED WINDOW SLOTS (neither stale nor never-checked nor "
            "POLICY_A, while debt waits outside):",
            wasted,
        )
        rc = 1
    if missed:
        tag = "QUEUED for the next window" if rc == 0 else "MISSED"
        print(f"{tag} ({len(missed)}):", missed)
    if never_missed:
        print("never-checked rows outside the window:", never_missed)
    return rc


if __name__ == "__main__":
    sys.exit(main())
