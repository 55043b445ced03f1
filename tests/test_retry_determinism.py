"""Task-retry determinism (r13 verdict item 5), pinned end-to-end.

The probe needs ``master=local[4, 3]`` (task retries) which cannot
coexist with the shared ``local[*]`` test session in one JVM, so it
runs as a subprocess: scripts/retry_determinism.py injects a
fail-once-on-attempt-0 Arrow kernel upstream of a salted join, a
counter-keyed da.random draw, and a hash-threshold sample, and asserts
value identity against uninjected runs. See the script docstring for
the three pinned claims and their code citations.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_retry_determinism_probe():
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "retry_determinism.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, f"probe failed:\n{out.stdout}\n{out.stderr}"
    assert "RETRY_DETERMINISM_OK" in out.stdout
    assert "salted_join:" in out.stdout
    assert "da.random:" in out.stdout
    assert "hash-threshold sample:" in out.stdout
