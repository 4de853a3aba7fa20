"""Multi-process `jax.distributed` rollout (the DCN code path).

Spawns 2 coordinator-connected processes, each contributing 4 virtual CPU
devices; the env batch shards over the 8-device global mesh and the
psum-reduced metrics must agree bitwise across processes
(scripts/multihost_rollout.py).  Replaces the reference's subprocess
vectorization tests (tests/envs/test_multiprocessing.py:35-59) with the
TPU-native multi-host equivalent.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "multihost_rollout.py",
)


@pytest.mark.slow
def test_multihost_rollout_two_processes():
    proc = subprocess.run(
        [sys.executable, SCRIPT, "2", "4"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIHOST PASS" in proc.stdout
