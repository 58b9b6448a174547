"""Spectral amplitude enhancement + adaptive smoothing (batched, masked).

Reformulates mbelib.c:412-666 (mbe_spectralAmpEnhanceWithRm0) and
mbe_adaptive.c:151-256 (JMBE Algorithms #111-116) as pure [57, C]-lane
vector math (channel-minor [57, C] band arrays). Per-channel L in [1, 56]
is handled with masks; invalid lanes
(e.g. erasure frames with w0 == 0 that never take the voice path) are
sanitized so they cannot poison the batch with NaN/Inf.
"""

import jax.numpy as jnp
import numpy as np

FLOAT_MAX = np.float32(np.finfo(np.float32).max)

_L_IDX = np.arange(57, dtype=np.float32)  # band index as float
_L_IDX_I = np.arange(57, dtype=np.int32)


def band_mask(L):
    """[57, C] bool: 1 <= l <= L (channel-minor)."""
    return (_L_IDX_I[:, None] >= 1) & (_L_IDX_I[:, None] <= L[None, :])


def spectral_amp_enhance(w0, L, Ml):
    """mbe_spectralAmpEnhanceWithRm0 (mbelib.c:641-661).

    Args: w0 [C] f32, L [C] i32, Ml [57, C] f32.
    Returns: (Ml_enhanced [57, C], rm0 [C]) — rm0 is the pre-enhancement
    spectral energy consumed by adaptive smoothing.
    Lanes with invalid L (outside [1,56]) are returned unchanged with rm0=0
    (matching the reference's early-out, mbelib.c:647-649).
    """
    valid = (L >= 1) & (L <= 56)
    mask = band_mask(L)
    w0s = jnp.where(w0 > 1e-12, w0, jnp.float32(1.0))  # sanitize erasure lanes

    cos_tab = jnp.cos(w0s[None, :] * jnp.asarray(_L_IDX)[:, None])  # [57,C]
    Ml2 = jnp.where(mask, Ml * Ml, 0.0)
    Rm0 = jnp.sum(Ml2, axis=0)
    Rm1 = jnp.sum(Ml2 * cos_tab, axis=0)
    R2m0 = Rm0 * Rm0
    R2m1 = Rm1 * Rm1

    num = jnp.float32(0.96 * np.pi) * ((R2m0 + R2m1)[None, :]
                                       - 2.0 * (Rm0 * Rm1)[None, :] * cos_tab)
    den = (w0s * Rm0 * (R2m0 - R2m1))[None, :]
    ratio = num / jnp.where(den != 0.0, den, jnp.float32(1.0))
    ratio = jnp.where(den != 0.0, ratio, jnp.float32(1.0))
    ratio = jnp.where(jnp.isfinite(ratio) & (ratio >= 0.0), ratio, jnp.float32(1.0))
    Wl = jnp.sqrt(jnp.maximum(Ml, 0.0)) * jnp.sqrt(jnp.sqrt(ratio))
    Wl = jnp.where(jnp.isfinite(Wl), Wl, jnp.float32(1.0))

    low_band = (8 * _L_IDX_I[:, None]) <= L[None, :]
    factor = jnp.clip(Wl, 0.5, 1.2)
    keep = low_band | (Ml == 0.0)
    Ml_w = jnp.where(mask & ~keep, factor * Ml, Ml)

    sum_sq = jnp.sum(jnp.where(mask, jnp.abs(Ml_w) ** 2, 0.0), axis=0)
    gamma = jnp.where(sum_sq == 0.0, jnp.float32(1.0),
                      jnp.sqrt(Rm0 / jnp.where(sum_sq == 0.0, 1.0, sum_sq)))
    Ml_out = jnp.where(mask, gamma[None, :] * Ml_w, Ml_w)

    Ml_out = jnp.where(valid[None, :], Ml_out, Ml)
    rm0_out = jnp.where(valid, Rm0, 0.0)
    return Ml_out, rm0_out


def adaptive_smoothing(Ml, Vl, L, error_rate, error_total, error_count4,
                       prev_local_energy, prev_amplitude_threshold, rm0):
    """JMBE Algorithms #111-116 (mbe_applyAdaptiveSmoothingCore,
    mbe_adaptive.c:217-256).

    Returns (Ml', Vl', localEnergy', amplitudeThreshold' [C] i32).
    """
    mask = band_mask(L)

    # #111: local energy IIR with floor (mbe_adaptive.c:163-174)
    prev_e = jnp.where(prev_local_energy < 10000.0, jnp.float32(75000.0),
                       prev_local_energy)
    local_energy = jnp.float32(0.95) * prev_e + jnp.float32(0.05) * rm0
    local_energy = jnp.maximum(local_energy, jnp.float32(10000.0))

    # #112: adaptive threshold VM (mbe_adaptive.c:176-189)
    x8 = jnp.sqrt(jnp.sqrt(jnp.sqrt(local_energy)))
    energy = x8 * x8 * x8
    vm_mid = (jnp.float32(45.255) * energy) / jnp.exp(jnp.float32(277.26) * error_rate)
    vm_hi = jnp.float32(1.414) * energy
    vm = jnp.where((error_rate <= 0.005) & (error_total <= 4), FLOAT_MAX,
                   jnp.where((error_rate <= 0.0125) & (error_count4 == 0),
                             vm_mid, vm_hi))

    # #113: force voiced where Ml > VM
    Vl_out = jnp.where(mask & (Ml > vm[None, :]), 1, Vl)

    # #114: amplitude measure
    Am = jnp.sum(jnp.where(mask, Ml, 0.0), axis=0)

    # #115: amplitude threshold (may go negative; mbe_adaptive.c:191-200)
    prev_t = jnp.where(prev_amplitude_threshold <= 0, 20480,
                       prev_amplitude_threshold)
    tm = jnp.where((error_rate <= 0.005) & (error_total <= 6),
                   jnp.int32(20480),
                   jnp.int32(6000) - jnp.int32(300) * error_total + prev_t)

    # #116: scale if Am exceeds threshold
    do_scale = (Am > tm.astype(jnp.float32)) & (Am > 0.0)
    scale = tm.astype(jnp.float32) / jnp.where(Am != 0.0, Am, 1.0)
    Ml_out = jnp.where(mask & do_scale[None, :], Ml * scale[None, :], Ml)

    return Ml_out, Vl_out, local_energy, tm
