#!/usr/bin/env python3
"""Full performance sweep: all four codecs, hard + soft, in ONE process
(shared tunnel variance, cached compiles). Prints a markdown-ready table.

Usage: python tools/sweep.py [hard_channels] [soft_channels] [reps]
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ab_bench  # noqa: E402
import soft_bench  # noqa: E402

CODECS = ("imbe7200", "imbe7100", "ambe2450", "ambe2400")


def main():
    hard_c = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    soft_c = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    rows = []
    for codec in CODECS:
        fn, steps = ab_bench.build(codec, hard_c, unroll=4)
        th = ab_bench.measure(fn, hard_c, steps, reps, codec=codec)
        print(f"# {codec} hard C={hard_c}: {th*1e3:.2f} ms/step "
              f"({hard_c/th:,.0f} f/s)", flush=True)
        fs, steps_s = soft_bench.build(codec, soft_c, unroll=4)
        ts = soft_bench.measure(fs, soft_c, steps_s, reps, codec=codec)
        print(f"# {codec} soft C={soft_c}: {ts*1e3:.2f} ms/step "
              f"({soft_c/ts:,.0f} f/s)", flush=True)
        rows.append((codec, th, ts))

    print("\n| Codec | hard C=%d | soft C=%d |" % (hard_c, soft_c))
    print("|---|---|---|")
    for codec, th, ts in rows:
        print(f"| {codec} | {th*1e3:.2f} ms → {hard_c/th/1e6:.2f}M f/s "
              f"| {ts*1e3:.2f} ms → {soft_c/ts/1e6:.2f}M f/s |")


if __name__ == "__main__":
    main()
