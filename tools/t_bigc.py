#!/usr/bin/env python3
"""Does hard-path throughput still saturate at C=32768?

Round 2 measured C=65536 neutral (6.59 vs 6.63M f/s) — but the step is
~1.8x faster now, so fixed per-step costs (scan floor, dispatch) are a
larger share and a bigger batch may amortize them further.

Usage: python tools/t_bigc.py [codec=imbe7200] [steps=30]
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.ab_bench import build, measure  # noqa: E402


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    for c in (32768, 49152, 65536):
        fn, st = build(codec, c, steps=steps)
        dt = measure(fn, c, st, reps=3, codec=codec)
        print(f"# {codec} hard C={c}: {dt*1e3:.2f} ms/step "
              f"({c/dt/1e6:.2f}M f/s)", flush=True)


if __name__ == "__main__":
    main()
