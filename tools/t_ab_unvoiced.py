#!/usr/bin/env python3
"""A/B: round-2 membership-mask unvoiced_fft vs band-map reformulation."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mbe_tpu.ops import synth, fft as fft_ops
from mbe_tpu.ops.enhance import band_mask
from tools.ab_bench import build, measure, ab

FFT_SIZE = synth.FFT_SIZE
_L_IDX_F = synth._L_IDX_F


def old_unvoiced_fft(cur_w0, cur_L, cur_Ml, cur_Vl, previous_uw, noise_buffer):
    synth._lazy_tables()
    uw = noise_buffer * jnp.asarray(synth._WIN256)[None, :]
    Xre, Xim = fft_ops.rfft256(uw)
    mult = synth.M_256_OVER_2PI * cur_w0
    lf = jnp.asarray(_L_IDX_F)[None, :]
    a_min = jnp.ceil((lf - 0.5) * mult[:, None]).astype(jnp.int32)
    b_max = jnp.ceil((lf + 0.5) * mult[:, None]).astype(jnp.int32)
    a_min = jnp.maximum(a_min, 0)
    b_max = jnp.minimum(b_max, FFT_SIZE // 2)
    bins = jnp.arange(FFT_SIZE // 2 + 1, dtype=jnp.int32)[None, None, :]
    member = (bins >= a_min[..., None]) & (bins < b_max[..., None])
    lmask = band_mask(cur_L) & (cur_Vl == 0)
    mag2 = Xre * Xre + Xim * Xim
    numerator = jnp.sum(jnp.where(member, mag2[:, None, :], 0.0), axis=-1)
    bin_count = (b_max - a_min).astype(jnp.float32)
    ok = lmask & (bin_count > 0) & (numerator > 1e-10)
    denom = jnp.where(bin_count > 0, bin_count, 1.0)
    mean = numerator / denom
    scalor = synth.UNVOICED_SCALE_COEFF * cur_Ml / jnp.sqrt(
        jnp.where(mean > 0, mean, 1.0))
    scalor = jnp.where(ok, scalor, 0.0)
    bin_scalor = jnp.sum(
        jnp.where(member & ok[..., None], scalor[..., None], 0.0), axis=1)
    uw_out = fft_ops.irfft256(Xre * bin_scalor, Xim * bin_scalor)
    zeros32 = jnp.zeros((uw_out.shape[0], 32), jnp.float32)
    prev_part = jnp.concatenate([previous_uw[:, 128:], zeros32], axis=-1)
    curr_part = jnp.concatenate([zeros32, uw_out[:, :128]], axis=-1)
    wp = jnp.asarray(synth._W_PREV)[None, :]
    wc = jnp.asarray(synth._W_CURR)[None, :]
    dn = jnp.asarray(synth._W_DENOM)[None, :]
    add = jnp.where(dn > 1e-10, (wp * prev_part + wc * curr_part) / dn, 0.0)
    return add, uw_out


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    new_impl = synth.unvoiced_fft

    synth.unvoiced_fft = old_unvoiced_fft
    fn_a, steps = build(codec, channels)
    jax.block_until_ready(fn_a(__import__("mbe_tpu.models.state",
                                          fromlist=["init_state"]).init_state(channels)))

    synth.unvoiced_fft = new_impl
    fn_b, _ = build(codec, channels)

    a, b = ab(fn_a, fn_b, channels, steps, rounds=4)
    print(f"{codec} C={channels}: old {a*1e3:.3f} ms  new {b*1e3:.3f} ms  "
          f"ratio {a/b:.3f}x")


if __name__ == "__main__":
    main()
