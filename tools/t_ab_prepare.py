#!/usr/bin/env python3
"""Probe: what do the AMBE full-tree plain `select` passes really cost?

A = HEAD.
B = `state.select` stubbed to pass-through inside models/ambe.py — kills
the three `_ambe_prepare` need_init selects and the `_speech_paths`
tone_replay select. NOT bit-exact (frame-1 lazy init + tone-replay lanes
change); this is a sizing probe for a `prepared=True` static-flag design,
not a shippable variant.

Usage: python tools/t_ab_prepare.py [codec] [channels] [rounds]
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
from mbe_tpu.models import ambe  # noqa: E402


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "ambe2450"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    fn_a, steps = build(codec, channels)
    jax.block_until_ready(fn_a(init_for(codec, channels)))  # trace A first

    orig = ambe.select
    ambe.select = lambda m, a, b: b  # pass-through
    fn_b, _ = build(codec, channels)
    jax.block_until_ready(fn_b(init_for(codec, channels)))
    ambe.select = orig

    best_a = best_b = float("inf")
    for r in range(rounds):
        best_a = min(best_a, measure(fn_a, channels, steps, 1, codec))
        best_b = min(best_b, measure(fn_b, channels, steps, 1, codec))
        print(f"round {r}: A(HEAD) {best_a*1e3:.3f} ms  "
              f"B(no plain selects) {best_b*1e3:.3f} ms", flush=True)
    print(f"{codec} C={channels}: A {best_a*1e3:.3f} vs B {best_b*1e3:.3f} "
          f"ms -> selects cost {(best_a-best_b)*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
