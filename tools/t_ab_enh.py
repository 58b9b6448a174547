#!/usr/bin/env python3
# ARCHIVAL EVIDENCE (round-2/3): written against the pre-round-3
# channel-MAJOR layout; the measurements it documents are recorded in
# docs/PERFORMANCE.md. Not runnable on the channel-minor build.
"""A/B: full ChannelState scan carry vs dropping the redundant IMBE `enh`
copy (enh == cur at every IMBE step boundary, so the carry need not
duplicate it)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402
from mbe_tpu.models.state import ChannelState  # noqa: E402
from tools.ab_bench import build, measure  # noqa: E402


def build_noenh(codec, channels, steps=50):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        cur, prev, rng_, lcg, acc = carry
        s = ChannelState(cur=cur, prev=prev, enh=cur, comfort_rng=rng_,
                         lcg_prime=lcg)
        s2, audio, res, _ = pipeline.step(codec, frame, s)
        return (s2.cur, s2.prev, s2.comfort_rng, s2.lcg_prime,
                acc + jnp.sum(audio)), 0

    def run(s0):
        return jax.lax.scan(
            body, (s0.cur, s0.prev, s0.comfort_rng, s0.lcg_prime,
                   jnp.float32(0)), None, length=steps)[0]

    return jax.jit(run), steps


def main():
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    fn_a, steps = build("imbe7200", channels)
    fn_b, _ = build_noenh("imbe7200", channels)
    for fn in (fn_a, fn_b):
        jax.block_until_ready(fn(st.init_state(channels)))
    best_a = best_b = np.inf
    for _ in range(4):
        best_a = min(best_a, measure(fn_a, channels, steps, reps=1))
        best_b = min(best_b, measure(fn_b, channels, steps, reps=1))
    print(f"imbe7200 C={channels}: with enh {best_a*1e3:.3f} ms  "
          f"no-enh-carry {best_b*1e3:.3f} ms  ratio {best_a/best_b:.3f}x")


if __name__ == "__main__":
    main()
