"""Profiling helpers: xprof traces + device-side stage timing.

The reference has no tracing (SURVEY.md §5); its analog is the opt-in
micro-benchmarks. Here: `trace()` wraps jax.profiler for xprof/tensorboard
dumps, and `device_time()` measures steady-state per-iteration device time
by scanning a body N times inside one dispatch (avoids tunnel/dispatch
latency skewing small kernels).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(body, carry0, iters: int = 50, warmup: bool = True) -> float:
    """Seconds per iteration of `body` (carry -> carry), measured as one
    lax.scan of `iters` steps on device."""
    fn = jax.jit(lambda c0: jax.lax.scan(
        lambda c, _: (body(c), 0), c0, None, length=iters)[0])
    if warmup:
        jax.block_until_ready(fn(carry0))
    t0 = time.time()
    jax.block_until_ready(fn(carry0))
    return (time.time() - t0) / iters
