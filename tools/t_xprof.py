#!/usr/bin/env python3
"""Capture an xprof trace of the flagship step and print the op-level budget.

Complements tools/ablate.py (stage-level, monkeypatch-based): this shows the
POST-FUSION kernel budget exactly as XLA scheduled it — which fusions
dominate, what the DMA/compute overlap looks like — without perturbing the
graph. The chrome-trace JSON emitted by jax.profiler is parsed in-process;
no TensorBoard needed.

Usage: python tools/t_xprof.py [codec] [channels] [scan_steps]
Trace is left in /tmp/xprof_<codec>/ for later inspection.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        s, acc = carry
        s2, audio, _, _ = pipeline.step(codec, frame, s)
        return (s2, acc + jnp.sum(audio)), 0

    run = jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=steps)[0])
    s0 = st.init_state(channels, carry_enh=not codec.startswith("imbe"))

    jax.block_until_ready(run(s0))  # compile + warm
    logdir = f"/tmp/xprof_{codec}"
    jax.profiler.start_trace(logdir)
    jax.block_until_ready(run(s0))
    jax.profiler.stop_trace()
    print(f"# trace captured: {logdir} (C={channels}, {steps} scan steps)")

    # ---- parse the chrome trace: per-op device-time budget ----
    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])

    # device tracks: process metadata names containing 'TPU' (or 'Device')
    proc_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_name.items()
                if "TPU" in n or "Device" in n or "device" in n}
    if not dev_pids:  # CPU runs: one '/host:CPU' track carries the ops
        dev_pids = set(proc_name)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    byline = defaultdict(float)
    byfile = defaultdict(float)
    lineops = defaultdict(set)
    total = 0.0
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and "dur" in e):
            name = e.get("name", "?")
            # skip the umbrella events (whole-jit / scan while-loop spans
            # that double-count every op inside them)
            if name == "while" or name.startswith("jit_"):
                continue
            tot[name] += e["dur"]
            cnt[name] += 1
            total += e["dur"]
            src = e.get("args", {}).get("source", "<none>")
            src = src.replace("/root/repo/", "")
            byline[src] += e["dur"]
            byfile[src.split(":")[0]] += e["dur"]
            lineops[src].add(name)
    if not tot:
        print("no device events found; pids:", proc_name, file=sys.stderr)
        return

    per_step = total / steps / 1e3
    print(f"# device op time: {total / 1e3:.2f} ms total, "
          f"{per_step:.3f} ms/step (sum of op durations, umbrella events "
          f"excluded; overlapping tracks can exceed wall step time)")
    print(f"{'op':60s} {'ms/step':>9s} {'%':>6s} {'calls':>6s}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{name[:60]:60s} {us / steps / 1e3:9.4f} "
              f"{100 * us / total:6.2f} {cnt[name]:6d}")

    # ---- source attribution: XLA records the python line each fused op
    # came from; bucketing by it turns "fusion.1329" into "voiced.py:172"
    print("\n# by source file")
    for f, us in sorted(byfile.items(), key=lambda kv: -kv[1]):
        print(f"{us / steps / 1e3:9.4f} ms {100 * us / total:5.1f}%  {f}")
    print("\n# by source line (>= 0.004 ms/step)")
    for s, us in sorted(byline.items(), key=lambda kv: -kv[1]):
        if us / steps / 1e3 < 0.004:
            continue
        print(f"{us / steps / 1e3:9.4f} ms {100 * us / total:5.1f}%  {s}"
              f"  [{len(lineops[s])} ops]")


if __name__ == "__main__":
    main()
