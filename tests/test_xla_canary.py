"""Opt-in TPU canary for the jax-0.9.0 mixed-offset slice/stack miscompile.

`models/imbe.py` carries a `jax.lax.optimization_barrier` working around a
real XLA:TPU wrong-code bug (stacking slices of the SAME array at DIFFERENT
column offsets returns corrupted lanes on TPU under jax 0.9.0; minimal repro
in tools/t_xla_stack_repro.py). This test keeps two facts pinned:

1. the shipped workaround pattern is correct on the current backend, and
2. the bare pattern STILL miscompiles — so the first jax upgrade that fixes
   the bug flips this test red, which is the signal to retire the barrier
   (and, until then, that the miscompile class has not silently spread).

Reference analog: the CI sanitizer matrix that watches for toolchain-level
wrong-code (/root/reference/.github/workflows/ci.yml:19-191).

Opt-in because the in-process suite is pinned to the CPU backend by
conftest.py and the bug is TPU-only (spawns one subprocess on the default
= TPU backend):

    MBE_TPU_TPU_CANARY=1 python -m pytest tests/test_xla_canary.py -v
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("MBE_TPU_TPU_CANARY") != "1",
                    reason="opt-in: set MBE_TPU_TPU_CANARY=1 (needs a TPU)")
def test_stack_miscompile_canary():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "-u",
         os.path.join(REPO, "tools", "t_xla_stack_repro.py")],
        capture_output=True, text=True, timeout=900, env=env)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, "repro script crashed"
    m = re.search(r"SUMMARY bad_reproduces=(\d) workaround_ok=(\d) "
                  r"jax=(\S+) platform=(\S+)", proc.stdout)
    assert m, "no SUMMARY line from tools/t_xla_stack_repro.py"
    bad_reproduces, workaround_ok, jax_ver, platform = m.groups()
    if platform != "tpu" and platform != "axon":
        pytest.skip(f"default backend is {platform}, bug is TPU-only")
    # The shipped pattern must be correct no matter what.
    assert workaround_ok == "1", (
        "optimization_barrier workaround no longer produces correct "
        "results — models/imbe.py is now MISCOMPILED, do not ship")
    # The bare pattern should still be bad on the pinned jax. If this
    # fails after a jax upgrade, the bug is fixed: retire the barrier in
    # models/imbe.py (see the comment at the barrier site) and update
    # this test to assert bad_reproduces == 0 for the new floor version.
    assert bad_reproduces == "1", (
        f"mixed-offset slice/stack miscompile no longer reproduces on "
        f"jax {jax_ver} — the optimization_barrier workaround in "
        f"models/imbe.py can be retired (keep a changelog note)")
