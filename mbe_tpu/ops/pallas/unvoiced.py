"""Pallas TPU kernel: fused unvoiced FFT synthesis + WOLA (OPT-IN).

STATUS — measured negative, kept opt-in (MBE_TPU_PALLAS_UNVOICED=1).
Stage-only on TPU v5e at C=16384: this kernel 0.80 ms (cb=128) / 0.78 ms
(cb=256) vs the XLA path's 0.60 ms; full-step A/B at C=32768 read 0.904x.
Two structural reasons: (1) the XLA path runs the forward/inverse DFTs as
two [C,256]x[256,129] matmuls over ALL channels — far better MXU
utilization than this kernel's per-block [128,256]x[256,128] dots; (2)
the per-bin band-gain lookup (a [C]-wise gather from a 57-entry
per-channel table) is a Theta(57) select chain in both paths — monotone
expand/gather has no O(log) lane formulation without a sort, so fusion
saves only the HBM round-trips, which at these shapes are smaller than
the MXU-utilization loss. A segmented-scan XLA variant (Hillis-Steele
prefix/suffix over the bin axis replacing the [C,57,129] compare-reduce)
also measured slower (0.71 ms): XLA's fused masked row-reduce is already
efficient.

One VMEM-resident pass per 128-channel block covering the whole of
mbe_unvoiced_fft.c:714-761: windowed-noise forward DFT -> per-band energy
-> band scalors -> scaled inverse DFT -> WOLA combine. The XLA path
round-trips [C,256]/[C,129] intermediates through HBM between the DFT
matmuls and the band logic; here HBM sees only the inputs (windowed noise,
previous Uw, gated per-band gains, mult) and the outputs (WOLA add, new
previousUw) — ~4 KB/channel instead of ~12 KB.

Layout: channels on sublanes (blocks of 128), bins/samples on lanes. The
reference's Nyquist bin never contributes (b_max is clamped to 128 and
membership is k < b_max, mbe_unvoiced_fft.c:643-661), so the kernel works
on exactly K=128 bins — a perfect lane tile.

Band machinery, all in-register:
- per-bin band ids: floor(k/mult + 0.5) plus two correction rounds against
  the reference's own ceil-based edge expressions (same derivation as
  synth.band_of_bins — exact).
- per-band energy sums: bands tile the bin axis contiguously and band ids
  are monotone in k, so segment totals come from a segmented Hillis-Steele
  prefix + suffix scan along lanes (7 pltpu.roll steps each) — no [57,128]
  membership masks.
- per-bin gains: gains[band[k]] via a 57-step select chain over [CB,1]
  columns (the per-channel one-hot matmul alternative needs per-lane
  matrices the MXU cannot batch).

DFT precision: the f32 operands are split into bf16 hi+lo halves and each
matmul runs as three exact-accumulation bf16 MXU passes (ah@bh + ah@bl +
al@bh) — measured 107.7 dB vs f64 on these shapes, better than XLA's
HIGH (98.4 dB, the XLA path's measured-equivalent default) at half the
passes of HIGHEST.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 128       # channels per grid block (sublane dimension)
K = 128        # spectral bins carried (Nyquist excluded by construction)
N = 256        # FFT length
FRAME = 160
LMAX = 57
LP = 64        # band-gain columns padded to a lane tile


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(ah, al, bh, bl):
    """f32-ish matmul from pre-split bf16 halves (3 exact-acc MXU passes)."""
    def d(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _kernel(uw_ref, prev_ref, glm_ref, mult_ref,
            fch_ref, fcl_ref, fsh_ref, fsl_ref,
            ich_ref, icl_ref, ish_ref, isl_ref, wol_ref,
            add_ref, uwout_ref, *, cb):
    uh, ul = _split(uw_ref[...])                       # [CB, 256]
    xre = _dot3(uh, ul, fch_ref[...], fcl_ref[...])    # [CB, 128]
    xim = _dot3(uh, ul, fsh_ref[...], fsl_ref[...])
    mag2 = xre * xre + xim * xim

    # --- per-bin band ids (synth.band_of_bins, K=128 so no Nyquist) ------
    m = mult_ref[...]                                  # [CB, 1]
    safe = m > 0.0
    ki = jax.lax.broadcasted_iota(jnp.int32, (cb, K), 1)
    kf = ki.astype(jnp.float32)
    band = jnp.floor(kf / jnp.where(safe, m, 1.0) + 0.5)
    for _ in range(2):
        lo = jnp.ceil((band - 0.5) * m)
        hi = jnp.ceil((band + 0.5) * m)
        band = (band + (kf >= hi).astype(jnp.float32)
                - (kf < lo).astype(jnp.float32))
    band = jnp.where(safe, band, -1.0)

    # --- segment totals: segmented prefix + suffix scans along lanes ------
    ps = mag2
    for t in range(7):
        s = 1 << t
        take = (ki >= s) & (pltpu.roll(band, shift=s, axis=1) == band)
        ps = ps + jnp.where(take, pltpu.roll(ps, shift=s, axis=1), 0.0)
    ss = mag2
    for t in range(7):
        s = 1 << t
        take = (ki < K - s) & (pltpu.roll(band, shift=K - s, axis=1) == band)
        ss = ss + jnp.where(take, pltpu.roll(ss, shift=K - s, axis=1), 0.0)
    total = ps + ss - mag2                             # [CB, K]

    # --- per-bin scalor ---------------------------------------------------
    lo = jnp.maximum(jnp.ceil((band - 0.5) * m), 0.0)
    hi = jnp.minimum(jnp.ceil((band + 0.5) * m), jnp.float32(K))
    count = hi - lo
    gain = jnp.zeros_like(mag2)
    for l in range(LMAX):
        gain = jnp.where(band == jnp.float32(l), glm_ref[:, l:l + 1], gain)
    ok = safe & (count > 0.0) & (total > 1e-10)
    mean = total / jnp.where(count > 0.0, count, 1.0)
    scalor = gain / jnp.sqrt(jnp.where(mean > 0.0, mean, 1.0))
    scalor = jnp.where(ok, scalor, 0.0)

    # --- scaled inverse DFT ----------------------------------------------
    rh, rl = _split(xre * scalor)
    ih, il = _split(xim * scalor)
    uw_out = (_dot3(rh, rl, ich_ref[...], icl_ref[...])
              + _dot3(ih, il, ish_ref[...], isl_ref[...]))  # [CB, 256]
    uwout_ref[...] = uw_out

    # --- WOLA combine (mbe_unvoiced_fft.c:343-530) ------------------------
    # add[n] = wpd[n]*prev_uw[n+128] + wcd[n]*uw_out[n-32]; the rolls wrap,
    # but wpd is zero for n >= 106 and wcd zero for n < 55, which covers
    # every wrapped lane (rows 0/1 of the wol constant block).
    prev_sh = pltpu.roll(prev_ref[...], shift=128, axis=1)
    curr_sh = pltpu.roll(uw_out, shift=32, axis=1)
    add = (wol_ref[0:1, :] * prev_sh + wol_ref[1:2, :] * curr_sh)
    add_ref[...] = add[:, :FRAME]


@functools.lru_cache(maxsize=1)
def _consts():
    n = np.arange(N)[:, None]
    k = np.arange(K)[None, :]
    ang = 2.0 * np.pi * n * k / N
    fwd_c = np.cos(ang).astype(np.float32)             # [256, 128]
    fwd_s = (-np.sin(ang)).astype(np.float32)
    w = np.full(K, 2.0)
    w[0] = 1.0
    inv_c = ((w[:, None] * np.cos(ang.T)) / N).astype(np.float32)  # [128,256]
    inv_s = ((-w[:, None] * np.sin(ang.T)) / N).astype(np.float32)

    def split_np(x):
        hi = x.astype(np.dtype(jnp.bfloat16))
        lo = (x - hi.astype(np.float32)).astype(np.dtype(jnp.bfloat16))
        return hi, lo

    mats = sum((split_np(x) for x in (fwd_c, fwd_s, inv_c, inv_s)), ())

    from .. import synth
    synth._lazy_tables()
    wol = np.zeros((8, N), np.float32)
    dn = synth._W_DENOM
    g = dn > 1e-10
    wol[0, :FRAME] = np.where(g, synth._W_PREV / np.where(g, dn, 1.0), 0.0)
    wol[1, :FRAME] = np.where(g, synth._W_CURR / np.where(g, dn, 1.0), 0.0)
    return mats, wol


def unvoiced_wola(uw_windowed, previous_uw, glm, mult, interpret=False,
                  cb=CB):
    """Fused unvoiced synthesis. Returns (add [C,160], uw_out [C,256]).

    Args:
      uw_windowed: [C, 256] f32 noise * synthesis window.
      previous_uw: [C, 256] f32 previous frame's Uw.
      glm: [C, 64] f32 per-band gated gains — UNVOICED_SCALE_COEFF * Ml
        where the band is in-model and unvoiced, else 0 (cols 57+ zero).
      mult: [C, 1] f32, (256/2pi) * w0.
    """
    c = uw_windowed.shape[0]
    mats, wol = _consts()

    row = lambda width: pl.BlockSpec((cb, width), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    add, uw_out = pl.pallas_call(
        functools.partial(_kernel, cb=cb),
        interpret=interpret,
        grid=(c // cb,),
        in_specs=[row(N), row(N), row(LP), row(1)]
        + [const((N, K))] * 4 + [const((K, N))] * 4 + [const((8, N))],
        out_specs=(row(FRAME), row(N)),
        out_shape=(jax.ShapeDtypeStruct((c, FRAME), jnp.float32),
                   jax.ShapeDtypeStruct((c, N), jnp.float32)),
    )(uw_windowed, previous_uw, glm, mult,
      *(jnp.asarray(x) for x in mats), jnp.asarray(wol))
    return add, uw_out
