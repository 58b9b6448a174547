#!/usr/bin/env python3
"""Variance-controlled A/B benchmark harness.

TPU run-to-run variance over this environment's tunnel is ~±25%, which
swallows 10–20% optimization signals when A and B run in separate
processes. This harness measures candidate step functions back-to-back,
interleaved, inside one process, with the PCM output consumed (see
docs/PERFORMANCE.md on the dead-code-elimination pitfall).

Usage:
    python tools/ab_bench.py [codec] [channels] [reps]
measures the current pipeline; to A/B a change, import `measure` from a
script that monkeypatches the candidate implementation between calls.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402


def init_for(codec: str, channels: int):
    """Codec-appropriate initial state (IMBE drops the redundant enh carry)."""
    return st.init_state(channels, carry_enh=not codec.startswith("imbe"))


def build(codec: str, channels: int, steps: int = 50, unroll: int = 1):
    if codec not in pipeline.FRAME_SHAPES:
        raise SystemExit(f"unknown codec {codec!r}; one of "
                         f"{sorted(pipeline.FRAME_SHAPES)}")
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        s, acc = carry
        s2, audio, res, _ = pipeline.step(codec, frame, s)
        return (s2, acc + jnp.sum(audio)), 0  # consume the PCM

    return jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=steps,
        unroll=unroll)[0]), steps


def _force(out):
    """Fetch the scan's accumulator scalar to the host. block_until_ready
    is NOT a reliable completion gate over this TPU tunnel (measured
    2026-08-20: a matmul scan 'completed' 200x past MXU peak, then the
    readback stalled 972 ms) — only a data-dependent host fetch provably
    waits. See mbe_tpu/utils/profiling.py for the full protocol note."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def measure(fn, channels: int, steps: int, reps: int = 3, codec="imbe7200"):
    """ms/step of one fixed-length fn, readback-forced. NOTE: includes the
    per-dispatch constant (~25-30 ms) amortized over `steps` — fine for
    A/B RATIOS (both sides carry the same constant, which only DAMPENS
    the ratio), not for absolute numbers. Use measure_slope for those."""
    out = fn(init_for(codec, channels))
    _force(out)
    best = np.inf
    for _ in range(reps):
        s0 = init_for(codec, channels)
        jax.block_until_ready(s0)
        t0 = time.time()
        out = fn(s0)
        _force(out)
        best = min(best, (time.time() - t0) / steps)
    return best


def measure_slope(fn_short, n_short, fn_long, n_long, channels: int,
                  reps: int = 3, codec="imbe7200"):
    """Honest seconds/step: slope between two scan lengths. Cancels the
    per-dispatch constant (validated vs a known-FLOP matmul and the xprof
    device-op sum; mbe_tpu/utils/profiling.py docstring)."""
    s0 = init_for(codec, channels)
    _force(fn_short(s0))
    _force(fn_long(s0))
    t1 = t2 = np.inf
    for _ in range(reps):
        s0 = init_for(codec, channels)
        jax.block_until_ready(s0)
        t0 = time.time()
        _force(fn_short(s0))
        t1 = min(t1, time.time() - t0)
        t0 = time.time()
        _force(fn_long(s0))
        t2 = min(t2, time.time() - t0)
    return max(t2 - t1, 0.0) / (n_long - n_short)


def ab(fn_a, fn_b, channels: int, steps: int, rounds: int = 3,
       codec="imbe7200"):
    """Interleaved A/B: returns (best_a, best_b) seconds/step."""
    best_a = best_b = np.inf
    for fn in (fn_a, fn_b):  # compile both first
        jax.block_until_ready(fn(init_for(codec, channels)))
    for _ in range(rounds):
        best_a = min(best_a, measure(fn_a, channels, steps, reps=1,
                                     codec=codec))
        best_b = min(best_b, measure(fn_b, channels, steps, reps=1,
                                     codec=codec))
    return best_a, best_b


if __name__ == "__main__":
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    fn_s, n_s = build(codec, channels, steps=8)
    fn_l, n_l = build(codec, channels, steps=48)
    dt = measure_slope(fn_s, n_s, fn_l, n_l, channels, reps, codec=codec)
    print(f"{codec} C={channels}: {dt * 1e3:.3f} ms/step (slope) -> "
          f"{channels / dt:,.0f} frames/s ({channels / dt / 50:,.0f}x rt)")
