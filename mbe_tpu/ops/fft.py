"""256-pt real DFT as MXU matmuls.

For a fixed tiny N=256, the rfft/irfft pair is faster on TPU as two dense
f32 matmuls ([C,256] @ [256,129] twice, and back) than as an FFT kernel —
the MXU eats these shapes, and XLA can fuse the surrounding window/scale
elementwise ops. Matches jnp.fft.rfft/irfft to ~1e-6 relative (f32 HIGHEST).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

N = 256
NBINS = N // 2 + 1


def _prec():
    """DFT matmul precision. Default `high` (bf16_3x, ~2^-21 relative):
    measured identical worst-case golden SNR (68.4 dB) at half the MXU
    passes of `highest` — the DFT feeds audio directly, with no compounding
    predictor downstream (the WOLA overlap decays), so the round-1 HIGHEST
    rule (log2Ml predictor, models/spectral.py) does not bind here.
    MBE_TPU_FFT_PRECISION=highest restores the 6-pass decomposition."""
    mode = os.environ.get("MBE_TPU_FFT_PRECISION", "high")
    return (jax.lax.Precision.HIGH if mode == "high"
            else jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=1)
def _mats():
    n = np.arange(N)[:, None]          # [256, 1]
    k = np.arange(NBINS)[None, :]      # [1, 129]
    ang = 2.0 * np.pi * n * k / N
    fwd_c = np.cos(ang)                # [256, 129]
    fwd_s = -np.sin(ang)
    # inverse: x_n = (1/N)(re_0 + 2 sum_{k=1..127}(re cos + (-im) sin... )
    #                + re_128 (-1)^n)
    w = np.full(NBINS, 2.0)
    w[0] = 1.0
    w[NBINS - 1] = 1.0
    inv_c = (w[:, None] * np.cos(ang.T)) / N      # [129, 256]
    inv_s = (-w[:, None] * np.sin(ang.T)) / N     # multiplies im
    return (fwd_c.astype(np.float32), fwd_s.astype(np.float32),
            inv_c.astype(np.float32), inv_s.astype(np.float32))


def rfft256(x):
    """[..., 256] f32 -> (re [..., 129], im [..., 129])."""
    fc, fs, _, _ = _mats()
    hp = _prec()
    re = jnp.matmul(x, jnp.asarray(fc), precision=hp,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(x, jnp.asarray(fs), precision=hp,
                    preferred_element_type=jnp.float32)
    return re, im


def rfft256_packed(x):
    """Channel-minor packed rDFT: x [256, C] f32 -> reim [258, C] =
    [re | im] as ONE MXU matmul.

    Row-wise identical to rfft256 (each output row is an independent
    contraction), but one dot of 258 rows pads to 384 where two 129-row
    dots pad to 2x256 — ~25% less MXU work and half the kernel launches.
    Slice [:129] / [129:] for re/im; the slices fuse into elementwise
    consumers."""
    fc, fs, _, _ = _mats()
    hp = _prec()
    m = jnp.asarray(np.ascontiguousarray(
        np.concatenate([fc, fs], axis=1).T))  # [258, 256]
    return jnp.matmul(m, x, precision=hp,
                      preferred_element_type=jnp.float32)


def irfft256_packed(reim):
    """reim [258, C] ([re | im]) -> x [256, C] f32, one MXU matmul
    (channel-minor)."""
    _, _, ic, isn = _mats()
    hp = _prec()
    m = jnp.asarray(np.ascontiguousarray(
        np.concatenate([ic, isn], axis=0).T))  # [256, 258]
    return jnp.matmul(m, reim, precision=hp,
                      preferred_element_type=jnp.float32)


def irfft256(re, im):
    """(re, im) [..., 129] -> x [..., 256] f32 (numpy irfft semantics)."""
    _, _, ic, isn = _mats()
    hp = _prec()
    return (jnp.matmul(re, jnp.asarray(ic), precision=hp,
                       preferred_element_type=jnp.float32)
            + jnp.matmul(im, jnp.asarray(isn), precision=hp,
                         preferred_element_type=jnp.float32))
