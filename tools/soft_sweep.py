#!/usr/bin/env python3
"""Soft-path scaling + kernel-tile sweep (VERDICT round-3 item #4).

One process (shared tunnel variance, cached compiles):
  1. C-scaling: every codec's soft path at C in {8192, 16384, 32768}.
  2. Tile A/B on the flagship soft config (imbe7200, best C): softecc
     kernel channel-block CB in {128, 256} x codeword-tile cwt in
     {1024, 2048, 4096}. Each config gets a FRESH jit closure so the
     trace-time env read in softecc._tiles takes effect.

Usage: python tools/soft_sweep.py [reps]
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import soft_bench  # noqa: E402

CODECS = ("imbe7200", "imbe7100", "ambe2450", "ambe2400")
CHANNELS = (8192, 16384, 32768)


def run(codec, c, reps):
    fn, steps = soft_bench.build(codec, c)
    t = soft_bench.measure(fn, c, steps, reps, codec=codec)
    return t


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    rows = {}
    for codec in CODECS:
        for c in CHANNELS:
            t = run(codec, c, reps)
            rows[(codec, c)] = t
            print(f"# {codec} soft C={c}: {t*1e3:.2f} ms/step "
                  f"({c/t/1e6:.2f}M f/s)", flush=True)

    print("\n| Codec | " + " | ".join(f"C={c}" for c in CHANNELS) + " |")
    print("|---|" + "---|" * len(CHANNELS))
    for codec in CODECS:
        cells = [f"{rows[(codec, c)]*1e3:.2f} ms → "
                 f"{c/rows[(codec, c)]/1e6:.2f}M f/s" for c in CHANNELS]
        print(f"| {codec} | " + " | ".join(cells) + " |")

    # pick the best-throughput C for the tile sweep
    best_c = max(CHANNELS, key=lambda c: c / rows[("imbe7200", c)])
    print(f"\n# tile sweep on imbe7200 soft C={best_c} "
          f"(baseline CB=128 cwt=2048)", flush=True)
    results = []
    for cb in (128, 256):
        for cwt in (1024, 2048, 4096):
            os.environ["MBE_TPU_SOFT_CB"] = str(cb)
            os.environ["MBE_TPU_SOFT_CWT"] = str(cwt)
            try:
                t = run("imbe7200", best_c, reps)
            except Exception as e:  # tile doesn't divide / VMEM overflow
                print(f"# CB={cb} cwt={cwt}: FAILED ({type(e).__name__})",
                      flush=True)
                continue
            results.append((cb, cwt, t))
            print(f"# CB={cb} cwt={cwt}: {t*1e3:.2f} ms/step "
                  f"({best_c/t/1e6:.2f}M f/s)", flush=True)
    os.environ.pop("MBE_TPU_SOFT_CB", None)
    os.environ.pop("MBE_TPU_SOFT_CWT", None)

    if results:
        cb, cwt, t = min(results, key=lambda r: r[2])
        print(f"\n# best tile: CB={cb} cwt={cwt} at {t*1e3:.2f} ms/step "
              f"({best_c/t/1e6:.2f}M f/s)")


if __name__ == "__main__":
    main()
