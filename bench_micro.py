#!/usr/bin/env python3
"""Micro-benchmarks reproducing the reference's three bench shapes at batch.

Mirrors bench/bench_synth.c (full speech synthesis, L=40 mixed V/UV),
bench_unvoiced.c (all-unvoiced synthesis) and bench_convert.c (float->int16)
over C concurrent channels on the device, with device-side repetition so
dispatch latency doesn't pollute small kernels.

Usage: python bench_micro.py [channels]
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

from mbe_tpu.models import state as st  # noqa: E402
from mbe_tpu.models.speech import (current_frame_rm0,  # noqa: E402
                                   synthesize_speech_core)
from mbe_tpu.ops import noise, synth  # noqa: E402
from mbe_tpu.utils.profiling import device_time  # noqa: E402


def mixed_state(c, all_unvoiced=False, L=40, seed=7):
    """L=40 model with alternating V/UV bands (bench_synth.c:35-58 shape)."""
    rng = np.random.default_rng(seed)
    s = st.init_state(c)
    # band arrays are channel-MINOR ([57, C], models/state.py)
    Vl = np.zeros((57, c), np.int32)
    Ml = np.zeros((57, c), np.float32)
    if not all_unvoiced:
        Vl[1:L + 1:2, :] = 1
    Ml[1:L + 1, :] = rng.uniform(1.0, 40.0, (L, c)).astype(np.float32)
    p = dataclasses.replace(
        s.cur,
        w0=jnp.full((c,), 4 * np.pi / (L / 0.9254 * 4), jnp.float32),
        L=jnp.full((c,), L, jnp.int32),
        Vl=jnp.asarray(Vl), Ml=jnp.asarray(Ml),
        noiseSeed=jnp.full((c,), 1234.0, jnp.float32))
    return dataclasses.replace(s, cur=p, prev=jax.tree.map(jnp.copy, p))


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cn = jnp.zeros((160, c), jnp.float32)  # comfort noise, channel-minor

    # bench_synth: full speech synthesis, mixed V/UV, L=40
    s = mixed_state(c)
    def synth_body(carry):
        cur, prev = carry
        rm0 = current_frame_rm0(cur)
        audio, cur2, prev2, _ = synthesize_speech_core(
            cur, prev, cn, s.lcg_prime, rm0)
        return (cur2, prev2)
    dt = device_time(synth_body, (s.cur, s.prev))
    print(f"bench_synth    C={c}: {dt * 1e3:8.3f} ms/frame-batch -> "
          f"{c / dt:,.0f} frames/s (ref 1-core: 39,290)")

    # bench_unvoiced: all-unvoiced model
    s = mixed_state(c, all_unvoiced=True)
    def unv_body(carry):
        cur, prev = carry
        noise_buf, seed2, ps2 = noise.generate_noise_with_overlap(
            cur.noiseSeed, cur.noisePrevSeed, s.lcg_prime)
        add, uw = synth.unvoiced_fft(cur.w0, cur.L, cur.Ml, cur.Vl,
                                     prev.previousUw, noise_buf)
        cur2 = dataclasses.replace(cur, noiseSeed=seed2, noisePrevSeed=ps2,
                                   previousUw=uw)
        return (cur2, prev)
    dt = device_time(unv_body, (s.cur, s.prev))
    print(f"bench_unvoiced C={c}: {dt * 1e3:8.3f} ms/frame-batch -> "
          f"{c / dt:,.0f} frames/s (ref 1-core: ~271,000)")

    # bench_convert: float -> int16
    buf = jnp.asarray(np.random.default_rng(0).uniform(
        -5000, 5000, (c, 160)).astype(np.float32))
    def conv_body(x):
        return synth.float_to_short(x).astype(jnp.float32) * 1e-9 + x
    dt = device_time(conv_body, buf)
    print(f"bench_convert  C={c}: {dt * 1e3:8.3f} ms/batch -> "
          f"{c * 160 / dt / 1e9:.2f} Gsamples/s (ref 1-core: 1.55)")


if __name__ == "__main__":
    main()
