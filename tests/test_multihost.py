"""Multi-process `jax.distributed` rollout (the DCN code path).

Spawns 2 coordinator-connected processes, each contributing 4 virtual CPU
devices; the env batch shards over the 8-device global mesh.  The harness
(scripts/multihost_rollout.py) asserts (a) psum-reduced metrics agree
bitwise across processes, and (b) the FULL final state (int fields + f32
position bit patterns, sha256 over the allgathered arrays) of the 2x4
run is identical to a 1-process x 8-device run of the same global batch —
pinning DCN-vs-ICI layout invariance, not just plumbing.  (Round 5: this
caught a real bug — the global batch handed to
make_array_from_process_local_data was mis-sliced as process-local rows,
so multi-process runs simulated different scenes than single-process.)
Replaces the reference's subprocess vectorization tests
(tests/envs/test_multiprocessing.py:35-59) with the TPU-native multi-host
equivalent.
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
