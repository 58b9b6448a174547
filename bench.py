#!/usr/bin/env python3
"""Benchmark: batched full-pipeline decode+synthesis throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Workload: IMBE 7200x4400 hard-frame path (ECC + demod + parameter decode +
full speech synthesis — the reference's mbe_processImbe7200x4400Framef) over
C concurrent channels, R sequential frames carried through the per-channel
state inside one device-side lax.scan (the production shape: throughput from
channels, time via scan).

Baseline: the reference's bench_synth measured 39,290 frames/s on one CPU
core on this repo's build machine (BASELINE.md) — and that benchmark runs
synthesis only (no ECC/demod/param decode), so the comparison is
conservative in our disfavor.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402

BASELINE_FRAMES_PER_SEC = 39290.0  # reference bench_synth, 1 CPU core


def bench(codec="imbe7200", channels=8192, steps=50, reps=3):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))

    def body(s, _):
        s2, audio, res, _d = pipeline.step(codec, frame, s)
        return s2, jnp_sum(audio)

    import jax.numpy as jnp

    def jnp_sum(a):
        return jnp.sum(a)

    run = jax.jit(lambda s0: jax.lax.scan(body, s0, None, length=steps))

    t0 = time.time()
    out = run(st.init_state(channels))
    jax.block_until_ready(out)
    print(f"# compile+first run: {time.time() - t0:.1f}s "
          f"(devices={jax.devices()})", file=sys.stderr)

    best = np.inf
    for _ in range(reps):
        s0 = st.init_state(channels)
        jax.block_until_ready(s0)
        t0 = time.time()
        out = run(s0)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / steps)

    fps = channels / best
    print(f"# {codec}: C={channels} steps={steps} best={best * 1e3:.2f} "
          f"ms/step -> {fps:,.0f} frames/s ({fps / 50:,.0f}x realtime)",
          file=sys.stderr)
    return fps


def main():
    channels = int(os.environ.get("MBE_BENCH_CHANNELS", "32768"))
    steps = int(os.environ.get("MBE_BENCH_STEPS", "50"))
    fps = bench(channels=channels, steps=steps)
    print(json.dumps({
        "metric": "imbe7200_full_decode_synth_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
