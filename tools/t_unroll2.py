#!/usr/bin/env python3
"""Does unrolling 2 frames per scan iteration beat one-frame-per-step?

The scan carry (full decoder state, 3440 B/channel = 108 MB at C=32768)
makes one HBM round-trip per scan iteration (~0.237 ms touch-all floor,
tools/t_scanfloor.py). Two pipeline.step calls inside one scan body give
XLA the chance to keep the intermediate state in VMEM/registers between
the two frames, halving the per-frame carry traffic — IF it elides the
intermediate tuple.

Usage: python tools/t_unroll2.py [codec=imbe7200] [C=32768]
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


def run(codec, channels, unroll, frames=48, reps=3):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        s, acc = carry
        for _i in range(unroll):
            s, audio, _res, _ = pipeline.step(codec, frame, s)
            acc = acc + jnp.sum(audio)
        return (s, acc), 0

    length = frames // unroll
    fn = jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=length)[0])

    def init():
        return st.init_state(channels,
                             carry_enh=not codec.startswith("imbe"))

    jax.block_until_ready(fn(init()))
    best = np.inf
    for _ in range(reps):
        s0 = init()
        jax.block_until_ready(s0)
        t0 = time.time()
        jax.block_until_ready(fn(s0))
        best = min(best, (time.time() - t0) / frames)
    return best


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    for unroll in (1, 2, 4):
        dt = run(codec, channels, unroll)
        print(f"# {codec} C={channels} unroll={unroll}: "
              f"{dt*1e3:.3f} ms/frame ({channels/dt/1e6:.2f}M f/s)",
              flush=True)


if __name__ == "__main__":
    main()
