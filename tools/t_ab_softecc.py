#!/usr/bin/env python3
"""A/B: round-5 soft-ECC kernel (base + matches-hard terms hoisted out of
the tile epilogue) vs the round-4 kernel (loaded from git HEAD~ / a
pinned ref so both run in ONE process — tunnel variance is ±25% across
processes).

Usage: python tools/t_ab_softecc.py [codec] [channels] [rounds] [oldref]
"""

import importlib.util
import os
import subprocess
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
from mbe_tpu.ops.pallas import softecc  # noqa: E402
from ab_bench import init_for  # noqa: E402


def load_old(ref):
    src = subprocess.check_output(
        ["git", "-C", __file__.rsplit("/", 2)[0], "show",
         f"{ref}:mbe_tpu/ops/pallas/softecc.py"]).decode()
    path = "/tmp/softecc_old.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("softecc_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_soft(codec, channels, steps=30):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))
    rel = jax.device_put(
        rng.integers(0, 256, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        s, acc = carry
        s2, audio, res, _ = pipeline.step(codec, frame, s, soft_rel=rel)
        return (s2, acc + jnp.sum(audio)), 0

    return jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=steps)[0]), steps


def measure(fn, codec, channels, steps):
    s0 = init_for(codec, channels)
    jax.block_until_ready(s0)
    t0 = time.time()
    jax.block_until_ready(fn(s0))
    return (time.time() - t0) / steps


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oldref = sys.argv[4] if len(sys.argv) > 4 else "HEAD"

    fn_a, steps = build_soft(codec, channels)
    jax.block_until_ready(fn_a(init_for(codec, channels)))  # trace A (new)

    old = load_old(oldref)
    saved = (softecc.golay2312_soft_keys, softecc.hamming1511_soft_keys)
    softecc.golay2312_soft_keys = old.golay2312_soft_keys
    softecc.hamming1511_soft_keys = old.hamming1511_soft_keys
    fn_b, _ = build_soft(codec, channels)
    jax.block_until_ready(fn_b(init_for(codec, channels)))  # trace B (old)
    softecc.golay2312_soft_keys, softecc.hamming1511_soft_keys = saved

    best_a = best_b = float("inf")
    for r in range(rounds):
        best_a = min(best_a, measure(fn_a, codec, channels, steps))
        best_b = min(best_b, measure(fn_b, codec, channels, steps))
        print(f"round {r}: A(new) {best_a*1e3:.3f} ms  "
              f"B(old) {best_b*1e3:.3f} ms", flush=True)
    print(f"{codec} soft C={channels}: A {best_a*1e3:.3f} vs B "
          f"{best_b*1e3:.3f} ms -> {best_b/best_a:.3f}x "
          f"({channels/best_a/1e6:.2f}M f/s)")


if __name__ == "__main__":
    main()
