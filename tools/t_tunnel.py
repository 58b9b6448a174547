#!/usr/bin/env python3
"""Raw TPU-tunnel transfer bandwidth probe (streaming-bottleneck evidence).

stream_bench measures sustained StreamingDecoder throughput; this isolates
the host<->device transfer path itself (device_put / device_get of the
exact per-tick payloads) so the streaming number can be attributed:
device compute (~3.7 ms/step) vs tunnel I/O.

Usage: python tools/t_tunnel.py [C=16384]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bw(nbytes, secs):
    return nbytes / secs / 1e6


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    dev = jax.devices()[0]
    print(f"# t_tunnel device={dev.platform} C={c}", flush=True)

    payloads = {
        "frame_in (packed bytes)": np.zeros((c, 23), np.uint8),
        "pcm_out (int16)": np.zeros((c, 160), np.int16),
        "res_out (5x int32)": np.zeros((c, 5), np.int32),
    }
    for name, host in payloads.items():
        # host -> device
        d = jax.device_put(host, dev)
        d.block_until_ready()
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            jax.device_put(host, dev).block_until_ready()
        up = (time.time() - t0) / reps
        # device -> host
        t0 = time.time()
        for _ in range(reps):
            np.asarray(d)
        down = (time.time() - t0) / reps
        mb = host.nbytes / 1e6
        print(f"{name:26s} {mb:7.2f} MB  "
              f"h->d {up*1e3:8.2f} ms ({bw(host.nbytes, up):7.1f} MB/s)  "
              f"d->h {down*1e3:8.2f} ms ({bw(host.nbytes, down):7.1f} MB/s)",
              flush=True)

    # round-trip latency floor: 4-byte scalar
    s = jax.device_put(np.zeros((), np.int32), dev)
    s.block_until_ready()
    t0 = time.time()
    for _ in range(20):
        np.asarray(jnp.add(s, 1).block_until_ready())
    print(f"scalar round-trip (dispatch+sync+get): "
          f"{(time.time()-t0)/20*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
