"""Full-registry oracle parity guard.

The driver's correctness gate only verifies the first 50 registry
entries; this test runs ``scripts/check_parity.py`` (the local replica
of that gate) over ALL entries at sf0.01, so ``pytest tests/`` fails if
any oracle-backed query drifts from its DuckDB oracle — including the
ones outside the driver's window.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_registry_oracle_parity():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_parity.py"),
         "--sf", "/root/testdata/sf0.01"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    tail = "\n".join(r.stdout.splitlines()[-30:])
    assert r.returncode == 0, f"parity sweep failed:\n{tail}\n{r.stderr[-2000:]}"
