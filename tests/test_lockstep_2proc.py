"""Genuinely multi-process lockstep serving (tools/lockstep_2proc.py).

Two OS processes joined via jax.distributed drive lockstep engines with
unequal request streams and must shut down by unanimous consensus with
identical step counts — the cross-host desync scenario the protocol
exists for (parallel/serving.py docstring).
"""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_two_process_lockstep_consensus():
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "lockstep_2proc.py")],
        capture_output=True, text=True, timeout=300,
        env={"DLMCQ_LOCKSTEP_PORT": "12431", "PATH": "/usr/bin:/bin",
             "HOME": "/root"})
    assert r.returncode == 0, r.stdout + r.stderr
    assert "LOCKSTEP 2-PROC: PASS" in r.stdout
