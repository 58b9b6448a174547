#!/usr/bin/env python3
"""A/B: batched lane-dense IMBE slot scatter vs the round-4 row loop.

A = HEAD (MBE_TPU_IMBE_SCATTER=batched): one [172, C] tile chain + an
exact bf16 one-hot segment-sum matmul.
B = round-4 form (=packed): ~860 ops on [1, C] rows (1/8 sublane
occupancy) + per-column adds.

Usage: python tools/t_ab_scatterb.py [codec] [channels] [rounds]
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ab_bench import build, init_for, measure  # noqa: E402


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    os.environ["MBE_TPU_IMBE_SCATTER"] = "batched"
    fn_a, steps = build(codec, channels)
    jax.block_until_ready(fn_a(init_for(codec, channels)))  # trace A first

    os.environ["MBE_TPU_IMBE_SCATTER"] = "packed"
    fn_b, _ = build(codec, channels)
    jax.block_until_ready(fn_b(init_for(codec, channels)))  # trace B
    os.environ["MBE_TPU_IMBE_SCATTER"] = "batched"

    best_a = best_b = float("inf")
    for r in range(rounds):
        best_a = min(best_a, measure(fn_a, channels, steps, 1, codec))
        best_b = min(best_b, measure(fn_b, channels, steps, 1, codec))
        print(f"round {r}: A(batched) {best_a*1e3:.3f} ms  "
              f"B(row loop) {best_b*1e3:.3f} ms", flush=True)
    print(f"{codec} C={channels}: A {best_a*1e3:.3f} ms vs B "
          f"{best_b*1e3:.3f} ms -> {best_b/best_a:.3f}x")


if __name__ == "__main__":
    main()
