"""Opt-in multi-host (multi-process) smoke test.

Runs tools/multihost_smoke.py: a real 2-process `jax.distributed` CPU job
(2 virtual devices per process -> 4-device global mesh) through
`parallel.sharding.global_channel_mesh` + `sharded_sequence`, with every
worker's addressable shards compared against a single-process golden run.
This is the CPU stand-in for the 16k-channel multi-host stretch config
(SURVEY.md §5 distributed; reference analog: one-decoder-per-thread scaling,
README.md:188-199).

Opt-in (spawns 3 subprocesses, ~2-4 min on one core):
    MBE_TPU_MULTIHOST=1 python -m pytest tests/test_multihost.py -v
CI runs it in the dedicated `multihost` job.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("MBE_TPU_MULTIHOST") != "1",
                    reason="opt-in: set MBE_TPU_MULTIHOST=1")
def test_two_process_global_mesh_matches_golden():
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools",
                                            "multihost_smoke.py")],
        capture_output=True, text=True, timeout=1800)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0
    assert "MULTIHOST SMOKE OK" in proc.stdout
