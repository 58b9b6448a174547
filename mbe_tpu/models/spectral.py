"""Shared log-domain spectral amplitude prediction (batched).

Implements imbe_update_spectral_amplitudes (imbe7200x4400.c:294-354) and
ambe*_update_spectral_amplitudes (ambe3600x2450.c:389-459,
ambe3600x2400.c:427-497) over channel-minor [57, C] lanes. The two differ
only in the
interpolation weight (rho vs 0.65), the gain term (none vs BigGamma), and
the unvoiced magnitude factor.
"""

import jax.numpy as jnp
import numpy as np

_IDX = np.arange(57, dtype=np.int32)
_IDX_F = np.arange(57, dtype=np.float32)


def _permute(src, *arrays):
    """out[l, c] = arr[src[l, c], c] without a TPU gather: compare src
    against every source index and accumulate (gathers are slow on TPU).
    Unrolled over the 57 source positions — measured ~20% faster on the
    VPU than the 3-D compare-reduce, same single fused kernel."""
    outs = [jnp.zeros_like(a) for a in arrays]
    for m in range(57):
        eq = src == m
        outs = [jnp.where(eq, a[m:m + 1, :], o)
                for a, o in zip(arrays, outs)]
    return outs


def _row_at(idx, arr):
    """arr[idx[c], c] as a fused compare-reduce ([C] scalar per channel)."""
    eq = (jnp.arange(57, dtype=jnp.int32)[:, None] == idx[None, :])
    return jnp.sum(jnp.where(eq, arr, 0.0), axis=0)


def extend_prev(prev_Ml, prev_log2Ml, cur_L, prev_L):
    """Prev-model extension + [0]=[1] aliasing (imbe7200x4400.c:303-310,
    ambe3600x2450.c:406-414). Returns mutated (prev_Ml, prev_log2Ml).

    The source index is prev_L inside the extension region, l elsewhere,
    and 1 at l==0 — so instead of a full permutation this is two per-channel
    scalar picks + masked selects."""
    idx = jnp.asarray(_IDX)[:, None]
    ext = ((cur_L > prev_L)[None, :] & (idx > prev_L[None, :])
           & (idx <= cur_L[None, :]))

    def one(a):
        at_L = _row_at(prev_L, a)[None, :]
        out = jnp.where(ext, at_L, a)
        return jnp.where(idx == 0, a[1:2, :], out)

    return one(prev_Ml), one(prev_log2Ml)


def spectral_update(cur_L, prev_L, prev_Ml, prev_log2Ml, Tl, *,
                    weight, gamma=None, unvc=None, Vl=None,
                    cur_Ml=None, cur_log2Ml=None):
    """Log-domain prediction of current spectral amplitudes.

    Args:
      cur_L, prev_L: [C] i32 (clamped to [1,56] internally).
      prev_Ml, prev_log2Ml: [57, C] — PRE-mutation previous model.
      Tl: [57, C] IDCT residuals (index 0 unused).
      weight: [C] f32 interpolation weight (rho for IMBE, 0.65 for AMBE).
      gamma: [C] f32 or None — AMBE gain (enables the BigGamma term).
      unvc, Vl: AMBE unvoiced factor and voicing (None for IMBE).
      cur_Ml, cur_log2Ml: [57, C] existing current arrays (entries above L
        are preserved, matching the C loop bounds).
    Returns:
      (cur_Ml', cur_log2Ml', prev_Ml', prev_log2Ml', cur_L_clamped)
    """
    cL = jnp.clip(cur_L, 1, 56)
    pL = jnp.clip(prev_L, 1, 56)
    pM, pLg = extend_prev(prev_Ml, prev_log2Ml, cL, pL)

    lf = jnp.asarray(_IDX_F)[:, None]
    mask = ((jnp.asarray(_IDX)[:, None] >= 1)
            & (jnp.asarray(_IDX)[:, None] <= cL[None, :]))
    flokl = (pL.astype(jnp.float32) / cL.astype(jnp.float32))[None, :] * lf
    intkl = flokl.astype(jnp.int32)
    intkl = jnp.clip(intkl, 0, 56)
    deltal = flokl - intkl.astype(jnp.float32)
    upper = jnp.minimum(intkl + 1, 56)

    # shared-eq lo/hi pick: upper == min(intkl+1, 56) by construction, so
    # one compare chain feeds both selects (3 ops/m instead of the 4 two
    # independent _permute calls cost; bit-exact exclusive select)
    lg_lo = jnp.zeros_like(pLg)
    lg_hi = jnp.zeros_like(pLg)
    for m in range(57):
        eq = intkl == m
        lg_lo = jnp.where(eq, pLg[m:m + 1, :], lg_lo)
        lg_hi = jnp.where(eq, pLg[min(m + 1, 56):min(m + 1, 56) + 1, :],
                          lg_hi)
    del upper
    interp = (1.0 - deltal) * lg_lo + deltal * lg_hi
    ssum = jnp.sum(jnp.where(mask, interp, 0.0), axis=0)
    wsum = (weight / cL.astype(jnp.float32)) * ssum  # Sum43 / Sum77

    w = weight[None, :]
    c1 = w * (1.0 - deltal) * lg_lo
    c2 = w * deltal * lg_hi
    log2Ml = Tl + c1 + c2 - wsum[None, :]

    if gamma is not None:
        sum42 = jnp.sum(jnp.where(mask, Tl, 0.0), axis=0) / cL.astype(jnp.float32)
        big_gamma = gamma - jnp.float32(0.5) * jnp.log2(cL.astype(jnp.float32)) - sum42
        log2Ml = log2Ml + big_gamma[None, :]

    Ml = jnp.exp2(log2Ml)
    if unvc is not None:
        Ml = jnp.where(Vl == 1, Ml, unvc[None, :] * Ml)

    cur_Ml_out = jnp.where(mask, Ml, cur_Ml)
    cur_log2_out = jnp.where(mask, log2Ml, cur_log2Ml)
    return cur_Ml_out, cur_log2_out, pM, pLg, cL
