#!/usr/bin/env python3
"""Soft-path throughput (exhaustive-ML ECC): same methodology as
tools/ab_bench.py (PCM consumed in the scan carry, best-of-N within one
process).

Usage: python tools/soft_bench.py [codec] [channels] [reps]
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


def build(codec: str, channels: int, steps: int = 50, unroll: int = 1):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))
    rel = jax.device_put(
        rng.integers(0, 256, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        s, acc = carry
        s2, audio, res, _ = pipeline.step(codec, frame, s, soft_rel=rel)
        return (s2, acc + jnp.sum(audio)), 0  # consume the PCM

    return jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=steps,
        unroll=unroll)[0]), steps


def _init(codec, channels):
    return st.init_state(channels, carry_enh=not codec.startswith("imbe"))


def measure(fn, channels: int, steps: int, reps: int = 3, codec="imbe7200"):
    jax.block_until_ready(fn(_init(codec, channels)))
    best = np.inf
    for _ in range(reps):
        s0 = _init(codec, channels)
        jax.block_until_ready(s0)
        t0 = time.time()
        jax.block_until_ready(fn(s0))
        best = min(best, (time.time() - t0) / steps)
    return best


if __name__ == "__main__":
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    fn, steps = build(codec, channels)
    dt = measure(fn, channels, steps, reps, codec=codec)
    print(f"SOFT {codec} C={channels}: {dt * 1e3:.3f} ms/step -> "
          f"{channels / dt:,.0f} frames/s ({channels / dt / 50:,.0f}x rt)")
