"""Profiling helpers: xprof traces + device-side stage timing.

The reference has no tracing (SURVEY.md §5); its analog is the opt-in
micro-benchmarks. Here: `trace()` wraps jax.profiler for xprof/tensorboard
dumps, and `device_time()` measures steady-state per-iteration device time.

Measurement protocol (round 5): TWO scan lengths + a real host readback,
per-iteration time = the SLOPE between them. Two reasons, both measured on
this environment's TPU tunnel (2026-08-20):

1. `jax.block_until_ready` is not a reliable completion gate here — a
   4096^2 bf16 matmul scan "completed" in 27 us (200x past MXU peak) and
   the subsequent element readback then stalled 972 ms. Only fetching a
   data-dependent element to the host provably waits for execution.
2. A timed dispatch carries a large per-call constant (dispatch + tunnel
   + readback, ~25-30 ms measured) that a single-length measurement
   smears over the scan: the round-4 "3.2 ms/step" flagship number was
   really 2.57 ms device + 0.6 ms/step of amortized constant. The slope
   (t(n2) - t(n1)) / (n2 - n1) cancels every per-call constant; it was
   validated against a known-FLOP 4K matmul (0.721 ms measured vs ~0.7 ms
   bf16 peak floor) and against the xprof device-op sum of the flagship
   step (slope 2.57 ms vs xprof 2.59 ms).
"""

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(out):
    """Block until `out` is really computed: fetch one element of its first
    leaf to the host (block_until_ready alone is not trustworthy over the
    axon tunnel — see module docstring)."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def device_time(body, carry0, iters: int = 50, warmup: bool = True,
                short_iters: int | None = None, reps: int = 3) -> float:
    """Seconds per iteration of `body` (carry -> carry): slope between a
    short and a long device-side lax.scan (see module docstring). `warmup`
    is kept for API compatibility; compile+warm always happens."""
    n2 = iters
    n1 = short_iters if short_iters is not None else max(2, iters // 5)

    def mk(n):
        return jax.jit(lambda c0: jax.lax.scan(
            lambda c, _: (body(c), 0), c0, None, length=n)[0])

    f1, f2 = mk(n1), mk(n2)
    force(f1(carry0))
    force(f2(carry0))
    t1 = t2 = np.inf
    for _ in range(reps):
        t0 = time.time()
        force(f1(carry0))
        t1 = min(t1, time.time() - t0)
        t0 = time.time()
        force(f2(carry0))
        t2 = min(t2, time.time() - t0)
    return max(t2 - t1, 0.0) / (n2 - n1)
