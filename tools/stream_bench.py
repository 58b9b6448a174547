#!/usr/bin/env python3
"""Sustained host-streaming throughput (VERDICT r3 #6).

The reference's operating mode is a live per-20 ms call loop
(/root/reference/README.md:188-204); every headline number so far is a
device-resident lax.scan. This measures StreamingDecoder end-to-end on
the real chip: packed-byte input on the host, int16 PCM back on the
host, state donated across steps, an in-flight window of `depth` so the
~1.5 ms per-dispatch tunnel latency overlaps device compute.

Usage: python tools/stream_bench.py [codec=imbe7200] [C=16384] [frames=200]
Prints sustained frames/s for depth in {2,3} x unpack in {device,host},
plus the same-process scan-mode rate for comparison.
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.parallel.streaming import StreamingDecoder  # noqa: E402
from tools.ab_bench import build, measure  # noqa: E402


def run_stream(codec, c, frames, depth, unpack, pool):
    dec = StreamingDecoder(codec, c, depth=depth, unpack=unpack)
    # warm-up: compile + fill the window
    for i in range(depth + 1):
        for _ in dec.push(pool[i % len(pool)]):
            pass
    t0 = time.time()
    n_out = 0
    for i in range(frames):
        for _pcm, _res in dec.push(pool[i % len(pool)]):
            n_out += 1
    for _pcm, _res in dec.flush():
        n_out += 1
    dt = time.time() - t0
    # After warm-up the window holds exactly `depth` blocks, so every timed
    # push yields one block and flush drains the remaining `depth`.
    assert n_out == frames + depth, (n_out, frames, depth)
    return c * frames / dt


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    rows, cols = pipeline.FRAME_SHAPES[codec]
    nbytes = (rows * cols + 7) // 8
    rng = np.random.default_rng(0)
    pool = [rng.integers(0, 256, (c, nbytes), dtype=np.uint8)
            for _ in range(8)]

    print(f"# stream_bench {codec} C={c} frames={frames}", flush=True)
    for unpack in ("device", "host"):
        for depth in (2, 3):
            fps = run_stream(codec, c, frames, depth, unpack, pool)
            print(f"stream unpack={unpack:6s} depth={depth}: "
                  f"{fps/1e6:6.2f} M frames/s "
                  f"({c/fps*1e3:.2f} ms/frame-tick, {fps/50:,.0f}x rt)",
                  flush=True)

    fn, steps = build(codec, c, steps=50)
    dt = measure(fn, c, steps, reps=3, codec=codec)
    print(f"scan-mode same process: {c/dt/1e6:6.2f} M frames/s "
          f"({dt*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
