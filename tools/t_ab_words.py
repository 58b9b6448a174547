#!/usr/bin/env python3
"""A/B: packed-word threading through the IMBE hard decode (round 5).

A = HEAD: the fused pipeline hands decode_imbe4400_parms the 3
field-forward packed words assembled straight from the frame ECC outputs.
B = round-4 behavior: decode receives only bit planes and re-packs them
(pack_imbe_words), i.e. the [88, C] plane round trip stays in the graph.

Both variants are traced under their own patch state BEFORE interleaved
measurement (jit traces at first CALL — see CLAUDE.md).

Usage: python tools/t_ab_words.py [codec] [channels] [rounds]
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
from mbe_tpu.models import imbe  # noqa: E402


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    fn_a, steps = build(codec, channels)
    jax.block_until_ready(fn_a(init_for(codec, channels)))  # trace A first

    orig = imbe.process_imbe4400

    def no_words(*a, **k):
        k.pop("words", None)
        return orig(*a, **k)

    imbe.process_imbe4400 = no_words
    fn_b, _ = build(codec, channels)
    jax.block_until_ready(fn_b(init_for(codec, channels)))  # trace B patched
    imbe.process_imbe4400 = orig

    best_a = best_b = float("inf")
    for r in range(rounds):
        best_a = min(best_a, measure(fn_a, channels, steps, 1, codec))
        best_b = min(best_b, measure(fn_b, channels, steps, 1, codec))
        print(f"round {r}: A(packed-threaded) {best_a*1e3:.3f} ms  "
              f"B(plane round trip) {best_b*1e3:.3f} ms", flush=True)
    print(f"{codec} C={channels}: A {best_a*1e3:.3f} ms vs B "
          f"{best_b*1e3:.3f} ms -> {best_b/best_a:.3f}x")


if __name__ == "__main__":
    main()
