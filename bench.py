#!/usr/bin/env python3
"""Benchmark: batched full-pipeline decode+synthesis throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
   "compile_s": N, "extra": {<other 7 codec/path configs>}}

Workload (primary metric): IMBE 7200x4400 hard-frame path (ECC + demod +
parameter decode + full speech synthesis — the reference's
mbe_processImbe7200x4400Framef) over C concurrent channels, R sequential
frames carried through the per-channel state inside one device-side
lax.scan (the production shape: throughput from channels, time via scan).
The "extra" dict covers the other seven configs (4 codecs x hard/soft) so
a regression off the flagship path is visible in BENCH_r*.json; set
MBE_BENCH_FULL=0 to skip them.

compile_s records trace+compile+first-run seconds for the primary config
(cold-cache target < 180 s; measured 63 s cold / ~8 s warm — the 1049 s
recorded in BENCH_r02 was not reproducible in a clean process and is
attributed to host/TPU contention from a leftover background process).

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

# jax may be pre-imported by a .pth hook before this script runs, in which
# case JAX_PLATFORMS from the environment is read too late; re-apply it
# (no-op where the env var is honored normally or unset).
_p = os.environ.get("JAX_PLATFORMS") or os.environ.get("JAX_PLATFORM_NAME")
if _p:
    jax.config.update("jax_platforms", _p)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402

BASELINE_FRAMES_PER_SEC = 39290.0  # reference bench_synth, 1 CPU core


def _force(out):
    """Fetch one element of the result pytree — the only reliable
    completion gate over this TPU tunnel (block_until_ready can return
    before execution finishes; mbe_tpu/utils/profiling.py docstring)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def bench(codec="imbe7200", channels=8192, steps=48, reps=3, soft=False,
          unroll=4, short_steps=8):
    """Returns (best_fps, median_fps, compile_plus_first_run_seconds).

    Round-5 protocol: per-step time is the SLOPE between a short
    (`short_steps`) and a long (`steps`) device-side scan, each gated by a
    real host readback. The slope cancels the per-dispatch constant
    (~25-30 ms of tunnel/dispatch/readback on this environment) that the
    previous single-length protocol smeared over the scan — round-4's
    "3.2 ms/step" flagship was 2.57 ms device + amortized constant. The
    protocol was validated against a known-FLOP 4K matmul (0.72 ms vs
    ~0.7 ms bf16 peak) and the xprof device-op sum of this exact step
    (2.59 ms) — see mbe_tpu/utils/profiling.py. best/median are over
    `reps` interleaved repeats at each length; spreads are emitted so
    driver deltas can be judged against the documented ±25% tunnel
    variance rather than read as real."""
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))
    rel = (jax.device_put(rng.integers(0, 256, (channels, rows, cols),
                                       dtype=np.int32)) if soft else None)

    def body(carry, _):
        s, acc = carry
        s2, audio, res, _ = pipeline.step(codec, frame, s, soft_rel=rel)
        return (s2, acc + jnp.sum(audio)), 0  # consume the PCM

    # unroll: repeat the frame body per scan iteration so XLA keeps the
    # intermediate decoder state in VMEM instead of round-tripping the
    # full HBM carry every frame — measured 1.10x at unroll=4
    # (tools/t_unroll2.py; parity contract in docs/PERFORMANCE.md).
    def mk(n):
        return jax.jit(lambda s0: jax.lax.scan(
            body, (s0, jnp.float32(0)), None, length=n, unroll=unroll)[0])

    run_s, run_l = mk(short_steps), mk(steps)

    def init():
        # IMBE streams drop the redundant enh carry (state.py docstring)
        return st.init_state(channels, carry_enh=not codec.startswith("imbe"))

    t0 = time.time()
    _force(run_l(init()))
    compile_s = time.time() - t0
    _force(run_s(init()))
    print(f"# {codec}{' soft' if soft else ''}: compile+first run "
          f"{compile_s:.1f}s (devices={jax.devices()})", file=sys.stderr)

    t_short, t_long = [], []
    for _ in range(reps):
        s0 = init()
        jax.block_until_ready(s0)
        t0 = time.time()
        _force(run_s(s0))
        t_short.append(time.time() - t0)
        t0 = time.time()
        _force(run_l(s0))
        t_long.append(time.time() - t0)

    dn = steps - short_steps
    best = max(min(t_long) - min(t_short), 1e-9) / dn
    med = max(float(np.median(t_long)) - float(np.median(t_short)),
              1e-9) / dn
    const_ms = (min(t_short) - short_steps * best) * 1e3
    fps = channels / best
    print(f"# {codec}{' soft' if soft else ''}: C={channels} "
          f"slope({short_steps},{steps}) best={best * 1e3:.2f} ms/step "
          f"(median {med * 1e3:.2f}, dispatch-const ~{const_ms:.0f} ms) -> "
          f"{fps:,.0f} frames/s ({fps / 50:,.0f}x realtime)",
          file=sys.stderr)
    return fps, channels / med, compile_s


def _device_probe(timeout_s):
    """Bounded device-liveness check in a subprocess.

    Backend init over the TPU tunnel hangs indefinitely when the tunnel is
    down; probing in a child process (fresh backend) with a timeout turns
    that into a fast, clearly-attributed failure instead of a silent hang.
    """
    import subprocess
    # jax is pre-imported by a .pth hook on this machine, so JAX_PLATFORMS
    # in the child's env is read too late; re-apply it via jax.config.
    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS') "
            "or os.environ.get('JAX_PLATFORM_NAME')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "import jax.numpy as jnp\n"
            "x = jnp.ones((8, 8))\n"
            "(x @ x).block_until_ready()\n"
            "print('MBE_PROBE_OK', jax.devices())\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
        return "MBE_PROBE_OK" in r.stdout, (r.stdout + r.stderr)[-500:]
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s}s"


def main():
    if os.environ.get("MBE_BENCH_PROBE", "1") != "0":
        ok, detail = _device_probe(
            int(os.environ.get("MBE_BENCH_PROBE_TIMEOUT", "300")))
        if not ok:
            print("# bench.py: device backend unavailable (TPU tunnel "
                  f"down?) -- failing fast.\n# probe: {detail}",
                  file=sys.stderr)
            sys.exit(2)

    channels = int(os.environ.get("MBE_BENCH_CHANNELS", "32768"))
    soft_channels = int(os.environ.get("MBE_BENCH_SOFT_CHANNELS", "16384"))
    steps = int(os.environ.get("MBE_BENCH_STEPS", "50"))
    full = os.environ.get("MBE_BENCH_FULL", "1") != "0"

    reps = int(os.environ.get("MBE_BENCH_REPS", "5"))
    unroll = int(os.environ.get("MBE_BENCH_UNROLL", "4"))
    fps, fps_med, compile_s = bench(codec="imbe7200", channels=channels,
                                    steps=steps, reps=reps,
                                    unroll=unroll)

    extra = {"imbe7200_hard_fps_median": round(fps_med, 1)}
    if full:
        for codec in ("imbe7100", "ambe2450", "ambe2400"):
            f, fm, _ = bench(codec=codec, channels=channels, steps=steps,
                             reps=reps, unroll=unroll)
            extra[f"{codec}_hard_fps"] = round(f, 1)
            extra[f"{codec}_hard_fps_median"] = round(fm, 1)
        for codec in ("imbe7200", "imbe7100", "ambe2450", "ambe2400"):
            f, fm, _ = bench(codec=codec, channels=soft_channels,
                             steps=steps, soft=True, reps=reps,
                             unroll=unroll)
            extra[f"{codec}_soft_fps"] = round(f, 1)
            extra[f"{codec}_soft_fps_median"] = round(fm, 1)

    print(json.dumps({
        "metric": "imbe7200_full_decode_synth_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 2),
        "compile_s": round(compile_s, 1),
        "variance_note": ("slope protocol (round 5): ms/step = slope "
                          "between short/long readback-gated scans, "
                          "cancelling the ~25-30 ms per-dispatch tunnel "
                          "constant the r1-r4 single-length protocol "
                          "amortized into its numbers (r4's 3.2 ms/step "
                          "was 2.57 ms device time; validated vs xprof "
                          "device-op sum and a known-FLOP matmul). "
                          "best/median over %d in-process reps; "
                          "cross-process TPU tunnel variance is +/-25%% "
                          "(docs/PERFORMANCE.md) -- judge deltas against "
                          "the median spread, not single best values"
                          % reps),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
