#!/usr/bin/env python3
"""Benchmark: batched full-pipeline decode+synthesis throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Workload: IMBE 7200x4400 hard-frame path (ECC+demod+param decode+full
synthesis, the reference's mbe_processImbe7200x4400Framef) over C concurrent
channels scanned T frames deep — one device launch per (C, T) config.

Baseline: the reference's bench_synth on this repo's build machine measured
39,290 frames/s on one CPU core (BASELINE.md) — and that benchmark runs
synthesis only, no ECC/demod/param decode, so the comparison is conservative
in our disfavor.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402

BASELINE_FRAMES_PER_SEC = 39290.0  # reference bench_synth, 1 CPU core


def bench(codec="imbe7200", channels=1024, frames=64, reps=3):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 2, (frames, channels, rows, cols),
                             dtype=np.int32)

    run = jax.jit(
        lambda fr, s: pipeline.run_sequence(codec, fr, s),
        donate_argnums=(1,))

    state = st.init_state(channels)
    fr_dev = jax.device_put(frames_np)

    t0 = time.time()
    state, pcm, res = run(fr_dev, state)
    jax.block_until_ready(pcm)
    compile_s = time.time() - t0
    print(f"# compile+first run: {compile_s:.1f}s "
          f"(devices={jax.devices()})", file=sys.stderr)

    best = np.inf
    for _ in range(reps):
        state = st.init_state(channels)
        t0 = time.time()
        state, pcm, res = run(fr_dev, state)
        jax.block_until_ready(pcm)
        best = min(best, time.time() - t0)

    total_frames = frames * channels
    fps = total_frames / best
    print(f"# {codec}: C={channels} T={frames} best={best * 1e3:.1f} ms "
          f"-> {fps:,.0f} frames/s ({fps / 50:,.0f}x realtime)",
          file=sys.stderr)
    return fps


def main():
    channels = int(os.environ.get("MBE_BENCH_CHANNELS", "1024"))
    frames = int(os.environ.get("MBE_BENCH_FRAMES", "64"))
    fps = bench(channels=channels, frames=frames)
    print(json.dumps({
        "metric": "imbe7200_decode_synth_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
