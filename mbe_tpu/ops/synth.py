"""Speech/tone synthesis engine (batched over channels).

TPU-native reformulation of the reference synthesis chain
(mbelib.c:891-1105, mbe_unvoiced_fft.c:714-761):

- The per-harmonic oscillator recurrences become closed-form
  cos(phi + step*n) evaluations over a dense harmonic/sample grid with
  masked accumulation — no sequential dependence inside a frame.
- Channel-minor layout (round 3): band arrays are [57, C], buffers
  [256, C], audio [160, C] — channels ride the 128-wide lane axis, so
  the VPU band math runs at full lane occupancy instead of the ~45%
  a [C, 57] (57 -> 128 pad) layout gets.
- The 256-pt PFFFT pair becomes a DFT-as-matmul on the MXU (ops/fft.py).
- WOLA, window, clipping are plain fused elementwise ops with precomputed
  weight vectors.
- Tone synthesis uses exact uint32 phase accumulators with per-tone-id
  precomputed steps, vectorized as phase0 + step*(n+1) (mod 2^32).

All "hot loop" stages of the reference (SURVEY.md §3.1) live here.
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import T
from . import bits as bit_ops
from . import fft as fft_ops
from .enhance import band_mask

FRAME = 160
FFT_SIZE = 256
TWO_PI = np.float32(2.0 * np.pi)
WHITE_NOISE_SCALAR = np.float32(2.0 * np.pi / 53125.0)
SOFT_CLIP = np.float32((32767.0 * 0.95) / 7.0)
UNVOICED_SCALE_COEFF = np.float32(146.17696)
M_256_OVER_2PI = np.float32(256.0 / (2.0 * 3.14159265358979323846))

_L_IDX_F = np.arange(57, dtype=np.float32)
_L_IDX_I = np.arange(57, dtype=np.int32)
_N_IDX = np.arange(FRAME, dtype=np.float32)


def _use_pallas(env: str, c: int, default: str = "auto") -> bool:
    """Use a Pallas kernel? env: 1=always (interpret off-TPU so CI can
    exercise the wiring), 0=never, auto=TPU only. Needs the channel
    count to be a multiple of the 128-channel block."""
    mode = os.environ.get(env, default)
    if mode == "0" or c % 128 != 0:
        return False
    if mode == "1":
        return True
    return jax.default_backend() == "tpu"


def _use_pallas_voiced(c: int) -> bool:
    return _use_pallas("MBE_TPU_PALLAS_VOICED", c)


def _wola_weights():
    """Precomputed WOLA weight vectors (mbe_unvoiced_fft.c:159-170)."""
    ws = np.asarray(T.Ws_synthesis, np.float32)  # [211], index n+105

    def win(n):
        return ws[n + 105] if -105 <= n <= 105 else np.float32(0.0)

    w_prev = np.array([win(n) for n in range(FRAME)], np.float32)
    w_curr = np.array([win(n - FRAME) for n in range(FRAME)], np.float32)
    denom = w_prev * w_prev + w_curr * w_curr
    return w_prev, w_curr, denom


def _synthesis_window_256():
    """256-tap window centered at 128 (mbe_unvoiced_fft.c:172-175)."""
    ws = np.asarray(T.Ws_synthesis, np.float32)
    out = np.zeros(FFT_SIZE, np.float32)
    for i in range(FFT_SIZE):
        k = i - 128
        if -105 <= k <= 105:
            out[i] = ws[k + 105]
    return out


_W_PREV, _W_CURR, _W_DENOM = None, None, None
_WIN256 = None
_TONE_STEPS = None
_TONE_LUT = None


def _lazy_tables():
    global _W_PREV, _W_CURR, _W_DENOM, _WIN256, _TONE_STEPS, _TONE_LUT
    if _W_PREV is None:
        _W_PREV, _W_CURR, _W_DENOM = _wola_weights()
        _WIN256 = _synthesis_window_256()
        # Exact uint32 tone phase steps per tone id (mbelib.c:692-699),
        # computed in float64 exactly like the C double math.
        freqs = np.asarray(T.tone_freqs, np.float64)  # [256, 2]
        steps = (freqs / 8000.0) * 4294967296.0
        steps = np.where(steps <= 0.0, 0.0, steps + 0.5).astype(np.uint64)
        _TONE_STEPS = (steps & 0xFFFFFFFF).astype(np.uint32)
        # Per-tone-id lookup rows for render_tone, fetched with ONE exact
        # bf16 one-hot matmul instead of five 256-entry compare-reduces
        # (each lut1d re-streams its own [256, C] compare; the one-hot is
        # built once and the MXU does the rest). The float frequencies are
        # only ever COMPARED at runtime (active / dual), so they fold into
        # precomputed 0/1 columns, and the uint32 steps split into four
        # 8-bit limbs each — every table value <= 255, so bf16 products
        # are exact and each one-hot row has exactly one nonzero term.
        # Step limbs are pre-masked by active/dual exactly like the old
        # runtime selects (step2 = 0 unless dual; step1 only read when
        # active).
        f32 = np.asarray(T.tone_freqs, np.float32)
        valid = np.asarray(T.tone_valid, np.int32) != 0
        active = valid & (f32[:, 0] > 0.0)
        dual = ((f32[:, 1] > 0.0)
                & (np.abs(f32[:, 1] - f32[:, 0]) > np.float32(1e-6)))
        s1 = np.where(active, _TONE_STEPS[:, 0], 0).astype(np.uint32)
        s2 = np.where(active & dual, _TONE_STEPS[:, 1], 0).astype(np.uint32)
        cols = [active.astype(np.float32), (active & dual).astype(np.float32)]
        for s in (s1, s2):
            for b in range(4):
                cols.append(((s >> (8 * b)) & 0xFF).astype(np.float32))
        _TONE_LUT = np.stack(cols)  # [10, 256], values <= 255


# ---------------------------------------------------------------------------
# Phase update + model reconciliation (mbelib.c:912-951)
# ---------------------------------------------------------------------------

def reconcile_model_lengths(cur_L, cur_Ml, cur_Vl, prev_L, prev_Ml, prev_Vl):
    """eq 128/129 (mbelib.c:912-929): zero-fill Ml / set Vl=1 above the
    shorter model's L on whichever side is shorter. Returns
    (maxl, cur_Ml, cur_Vl, prev_Ml, prev_Vl)."""
    maxl = jnp.maximum(cur_L, prev_L)
    li = _L_IDX_I[:, None]
    grow_prev = ((cur_L > prev_L)[None, :] & (li > prev_L[None, :])
                 & (li <= cur_L[None, :]))
    grow_cur = ((cur_L <= prev_L)[None, :] & (li > cur_L[None, :])
                & (li <= prev_L[None, :]))
    prev_Ml = jnp.where(grow_prev, 0.0, prev_Ml)
    prev_Vl = jnp.where(grow_prev, 1, prev_Vl)
    cur_Ml = jnp.where(grow_cur, 0.0, cur_Ml)
    cur_Vl = jnp.where(grow_cur, 1, cur_Vl)
    return maxl, cur_Ml, cur_Vl, prev_Ml, prev_Vl


def count_unvoiced(Vl, L):
    """numUv counts Vl[0..L] == 0 including index 0 (mbelib.c:901-910)."""
    m = _L_IDX_I[:, None] <= L[None, :]
    return jnp.sum(jnp.where(m & (Vl == 0), 1, 0), axis=0)


def fmodf_2pi(x):
    """Exact fmodf(x, 2pi_f32) for 0 <= x < 2^13 — bit-identical to libm.

    The PSIl accumulator is wrapped with fmodf every frame
    (mbelib.c:936-940); fmodf is an EXACT operation (the remainder is
    always representable), while jnp.mod lowers to x - floor(x/y)*y whose
    divide/multiply each round — a few-ULP wrap error per frame that
    compounded through the PSIl chain into the audit's 62.6 dB worst-case
    frame (long_imbe7200 t=185: substituting the reference PSIl alone
    recovered 83 dB — tools/t_snr185.py, round 5). Long-division ladder:
    conditionally subtract y*2^k for k = 10..0. Every subtraction is
    Sterbenz-exact (y*2^k <= x < y*2^(k+1) at the time it fires), and
    y*2^k is an exact power-of-two scaling, so the result equals libm
    fmodf bit-for-bit (pinned vs np.fmod in test_synth.py).
    """
    for k in range(10, -1, -1):
        m = np.float32(TWO_PI * (1 << k))
        x = jnp.where(x >= m, x - m, x)
    return x


def update_phases(cur_w0, cur_L, cur_PSIl_old, cur_PHIl_old,
                  prev_w0, prev_PSIl, noise_buffer, num_uv):
    """mbe_update_speech_phases (mbelib.c:931-951) for l = 1..56.

    Index 0 of every phase array is untouched (the C loop runs l=1..56).
    Returns (cur_PSIl, cur_PHIl, prev_PSIl_wrapped) — all [57, C].
    noise_buffer: [256, C] f32 LCG samples (phase jitter uses entries 1..56).
    """
    li = jnp.asarray(_L_IDX_F)[:, None]
    psi_wrapped = fmodf_2pi(jnp.abs(prev_PSIl)) * jnp.sign(prev_PSIl)
    psi_wrapped = jnp.where(psi_wrapped < 0.0, psi_wrapped + TWO_PI, psi_wrapped)

    lN = li * jnp.float32(FRAME)
    cur_psi = psi_wrapped + (prev_w0 + cur_w0)[None, :] * (lN / jnp.float32(2.0))
    pl = WHITE_NOISE_SCALAR * noise_buffer[:57, :] - jnp.float32(np.pi)
    jitter = ((num_uv.astype(jnp.float32)[None, :] * pl)
              / cur_L.astype(jnp.float32)[None, :])
    low = _L_IDX_I[:, None] <= (cur_L // 4)[None, :]
    cur_phi = jnp.where(low, cur_psi, cur_psi + jitter)

    band0 = _L_IDX_I[:, None] == 0
    cur_psi = jnp.where(band0, cur_PSIl_old, cur_psi)
    cur_phi = jnp.where(band0, cur_PHIl_old, cur_phi)
    psi_wrapped = jnp.where(band0, prev_PSIl, psi_wrapped)
    return cur_psi, cur_phi, psi_wrapped


# ---------------------------------------------------------------------------
# Voiced synthesis (mbelib.c:953-1040) — hot loop #1
# ---------------------------------------------------------------------------

def render_voiced(cur_w0, cur_Ml, cur_Vl, cur_PHIl,
                  prev_w0, prev_Ml, prev_Vl, prev_PHIl, maxl):
    """Voiced component: [160, C] sum over harmonics (channel-minor).

    Windowed oscillator path (mbelib.c:970-1018) in closed form:
      prev: 2*prev_Ml * Ws[n+160] * cos(prev_PHIl + pw0*l*n)
      cur:  2*cur_Ml  * Ws[n]     * cos(cur_PHIl + cw0*l*(n-160))
    Interpolated path (mbelib.c:953-968) for l<8, both voiced, stable pitch.
    Band inputs are [57, C]; the Pallas kernel consumes the [56, C] slices
    directly (its lane layout has always been channel-minor — the prep
    transposes it used to do are now free).
    """
    ws = np.asarray(T.Ws, np.float32)  # [321]
    w_cur = jnp.asarray(ws[:FRAME])        # Ws[n]
    w_prev = jnp.asarray(ws[FRAME:2 * FRAME])  # Ws[n+160]

    li = jnp.asarray(_L_IDX_F[1:])[:, None, None]      # [56,1,1]
    lii = _L_IDX_I[1:, None]                           # [56,1]
    n = jnp.asarray(_N_IDX)[None, :, None]             # [1,160,1]

    cw0 = cur_w0[None, None, :]
    pw0 = prev_w0[None, None, :]
    cw0l = cw0 * li
    pw0l = pw0 * li

    cur_v = (cur_Vl[1:, :] == 1)
    prev_v = (prev_Vl[1:, :] == 1)
    active = (lii <= maxl[None, :]) & (cur_v | prev_v)

    cphi = cur_PHIl[1:, None, :]
    pphi = prev_PHIl[1:, None, :]

    # Interpolation eligibility (JMBE #134-138): only harmonics 1..7
    # (l < 8, mbelib.c:1032).
    NI = 7
    use_interp7 = ((lii[:NI, :] < 8) & cur_v[:NI, :] & prev_v[:NI, :]
                   & (jnp.abs(cur_w0 - prev_w0)[None, :]
                      < jnp.float32(0.1) * cur_w0[None, :]))
    use_interp = jnp.concatenate(
        [use_interp7, jnp.zeros((56 - NI, use_interp7.shape[1]), bool)],
        axis=0)

    # Windowed oscillator components, structured as three independent
    # multiply-cos-reduce chains so XLA fuses each into its [160, C] output
    # without materializing [56,160,C] grids in HBM (the window factor does
    # not depend on l, so it is applied AFTER the harmonic sum; this only
    # reorders f32 multiplies — SNR-level identical to the reference).
    gain_prev = jnp.where(prev_v & active & ~use_interp,
                          2.0 * prev_Ml[1:, :], 0.0)
    gain_cur = jnp.where(cur_v & active & ~use_interp,
                         2.0 * cur_Ml[1:, :], 0.0)

    # Interpolated-path coefficients (JMBE #134-138), [7, C] lane math.
    lf7 = jnp.asarray(_L_IDX_F[1:NI + 1])[:, None]
    deltaphil2 = (cur_PHIl[1:NI + 1, :] - prev_PHIl[1:NI + 1, :]
                  - ((prev_w0 + cur_w0)[None, :] * lf7
                     * jnp.float32(FRAME)) / jnp.float32(2.0))
    deltawl2 = (jnp.float32(1.0 / FRAME)
                * (deltaphil2 - TWO_PI * jnp.floor(
                    (deltaphil2 + jnp.float32(np.pi)) / TWO_PI)))
    gi2 = jnp.where(use_interp7 & active[:NI, :], jnp.float32(2.0), 0.0)

    if _use_pallas_voiced(cur_w0.shape[0]):
        from .pallas import voiced as pallas_voiced
        alpha = prev_w0[None, :] * lf7 + deltawl2
        q = (cur_w0 - prev_w0)[None, :] * lf7 / jnp.float32(2 * FRAME)
        amp0 = gi2 * prev_Ml[1:NI + 1, :]
        damp = gi2 * (cur_Ml[1:NI + 1, :] - prev_Ml[1:NI + 1, :]) \
            * jnp.float32(1.0 / FRAME)
        lcol = jnp.asarray(_L_IDX_F[1:])[:, None]
        return pallas_voiced.voiced_sums(
            gain_prev, prev_PHIl[1:, :], prev_w0[None, :] * lcol,
            gain_cur,
            cur_PHIl[1:, :] - (cur_w0[None, :] * lcol) * jnp.float32(FRAME),
            cur_w0[None, :] * lcol,
            amp0, damp, prev_PHIl[1:NI + 1, :], alpha, q,
            w_prev, w_cur,
            # MBE_TPU_PALLAS_VOICED=1 off-TPU runs interpret mode so CI can
            # exercise the full kernel wiring (gains/phases/interp coeffs)
            interpret=jax.default_backend() != "tpu")

    sum_prev = jnp.sum(gain_prev[:, None, :] * jnp.cos(pphi + pw0l * n),
                       axis=0)
    sum_cur = jnp.sum(gain_cur[:, None, :]
                      * jnp.cos(cphi + cw0l * (n - jnp.float32(FRAME))),
                      axis=0)
    out = w_prev[:, None] * sum_prev + w_cur[:, None] * sum_cur

    # Interpolated path over the 7 eligible harmonics only.
    li7 = li[:NI]
    pphi7 = pphi[:NI]
    pw0l7 = pw0l[:NI]
    theta_ln = (pphi7 + (pw0l7 + deltawl2[:, None, :]) * n
                + (cw0 - pw0) * li7 * n * n / jnp.float32(2 * FRAME))
    aln = (prev_Ml[1:NI + 1, None, :]
           + (n / jnp.float32(FRAME)) * (cur_Ml[1:NI + 1, None, :]
                                         - prev_Ml[1:NI + 1, None, :]))
    out = out + jnp.sum(gi2[:, None, :] * aln * jnp.cos(theta_ln), axis=0)
    return out  # [160, C]


# ---------------------------------------------------------------------------
# Unvoiced FFT synthesis + WOLA (mbe_unvoiced_fft.c:714-761) — hot loop #2
# ---------------------------------------------------------------------------

def band_of_bins(cur_w0):
    """Exact per-bin band id [129, C] (f32; -1 = no band).

    The reference's band intervals tile the bin axis contiguously —
    b_max[l] = ceil((l+0.5)*mult) = a_min[l+1] (mbe_unvoiced_fft.c:643-661)
    — so bin k's band is floor(k/mult + 0.5) up to f32 rounding at the
    edges. Two correction rounds against the reference's own f32 edge
    expressions make the assignment match the C's ceil-based membership
    bit-for-bit. One [129, C] map replaces the per-band membership masks
    the round-2 code materialized twice."""
    mult = M_256_OVER_2PI * cur_w0  # [C]
    kf = jnp.arange(FFT_SIZE // 2 + 1, dtype=jnp.float32)[:, None]  # [129,1]
    m = mult[None, :]
    safe = m > 0.0
    band = jnp.floor(kf / jnp.where(safe, m, 1.0) + jnp.float32(0.5))
    for _ in range(2):
        lo = jnp.ceil((band - jnp.float32(0.5)) * m)   # a_min[band] pre-clamp
        hi = jnp.ceil((band + jnp.float32(0.5)) * m)   # b_max[band] pre-clamp
        band = (band + (kf >= hi).astype(jnp.float32)
                - (kf < lo).astype(jnp.float32))
    # the reference clamps b_max to 128, so bin 128 belongs to no band
    return jnp.where(safe & (kf < jnp.float32(FFT_SIZE // 2)), band,
                     jnp.float32(-1.0))


def _mult_bounds():
    """Static bounds of mult = 256*w0/2pi over every nonzero w0 any codec
    path can write into a Parms state: the three voice w0-by-b0 tables,
    the AMBE silence models, and the IMBE/AMBE default models (erasure
    lanes have w0 == 0 and produce no bands at all). Used to bound which
    bins each band can touch (window construction below). A hand-built
    state with w0 outside every codec's range voids the bound — the
    framework itself can't produce one."""
    vals = [np.asarray(T.imbe_w0_by_b0), np.asarray(T.ambe2450_w0_by_b0),
            np.asarray(T.ambe2400_w0_by_b0),
            np.asarray(T.ambe2450_silence_f0_w0)[1:],
            np.asarray(T.ambe2400_silence_w0), np.asarray(T.default_w0)]
    w = np.concatenate([np.ravel(v) for v in vals]).astype(np.float64)
    w = w[w > 0]
    return (float(M_256_OVER_2PI) * w.min() * (1.0 - 1e-3),
            float(M_256_OVER_2PI) * w.max() * (1.0 + 1e-3))


@lru_cache(maxsize=1)
def _band_windows():
    """Per-band bin windows (8-aligned static slices) and per-bin-tile band
    candidate lists for the unvoiced stage (VERDICT r4 #6 follow-up).

    The reference's band intervals are contiguous in k with edges
    ceil((l -+ 0.5)*mult) (mbe_unvoiced_fft.c:643-661), and mult is bounded
    by the w0 tables (_mult_bounds) — so band l can only ever match bins in
    [floor((l-0.5)*mult_min), ceil((l+0.5)*mult_max)), and bin tile
    [8t, 8t+8) can only match bands in [8t/mult_max - 0.5,
    (8t+7)/mult_min + 0.5]. Restricting the [57, 129, C] compare-reduces
    to these windows drops ~45% of the element ops (the skipped pairs are
    exact zeros / non-matches, so both forms are bitwise identical)."""
    mlo, mhi = _mult_bounds()
    nb = FFT_SIZE // 2 + 1  # 129
    band_win = []
    for l in range(57):
        lo = max(0, int(np.floor(max(0.0, (l - 0.5)) * mlo)) // 8 * 8)
        hi = min(nb, -(-int(np.ceil((l + 0.5) * mhi)) // 8) * 8)
        band_win.append((lo, max(hi, lo + 8)))
    tile_bands = []
    for t in range(-(-nb // 8)):
        k0, k1 = 8 * t, min(8 * t + 7, nb - 1)
        blo = max(0, int(np.ceil(k0 / mhi - 0.5)))
        bhi = min(56, int(np.floor(k1 / mlo + 0.5)))
        tile_bands.append(list(range(blo, bhi + 1)))
    return band_win, tile_bands


def unvoiced_fft(cur_w0, cur_L, cur_Ml, cur_Vl, previous_uw, noise_buffer):
    """JMBE #117-126. Returns (unvoiced_add [160, C], new_previousUw
    [128, C]); band inputs [57, C], noise_buffer [256, C].

    previous_uw is the UPPER HALF of the reference's 256-float buffer —
    the WOLA reads prevUw[n+128] for n = 0..127 only (prev_idx clipped to
    < 256, mbe_unvoiced_fft.c:398-404), so the lower half is dead state
    and is not carried (round-4 state diet, -512 B/copy/channel).

    The 256-pt real FFT pair runs as MXU matmuls (ops/fft.py). A fully
    fused VMEM-resident Pallas kernel for the stage exists
    (ops/pallas/unvoiced.py) but measured SLOWER than this XLA path
    (0.80 vs 0.60 ms stage-only at C=16384, 0.904x end-to-end): batching
    the DFTs across all channels as two big MXU matmuls beats VMEM
    locality with per-block [128,256] matmuls, and the irreducible
    57-step band-gain gather costs the same either way. Kept opt-in
    (MBE_TPU_PALLAS_UNVOICED=1) with CI interpret-mode wiring."""
    _lazy_tables()
    uw = noise_buffer * jnp.asarray(_WIN256)[:, None]  # [256, C]

    if _use_pallas("MBE_TPU_PALLAS_UNVOICED", cur_w0.shape[0], default="0"):
        # the opt-in kernel keeps its original channel-major interface;
        # boundary transposes are acceptable on an already-negative path
        from .pallas import unvoiced as pallas_unvoiced
        lmask = band_mask(cur_L) & (cur_Vl == 0)
        glm = jnp.where(lmask, UNVOICED_SCALE_COEFF * cur_Ml, 0.0)
        glm = jnp.pad(glm.T, ((0, 0), (0, 64 - 57)))
        mult = (M_256_OVER_2PI * cur_w0)[:, None]
        # the kernel keeps the full-buffer interface; only the upper half
        # is carried (and read), so pad the dead lower half with zeros
        prev_full = jnp.pad(previous_uw.T, ((0, 0), (128, 0)))
        add, uw_out = pallas_unvoiced.unvoiced_wola(
            uw.T, prev_full, glm, mult,
            interpret=jax.default_backend() != "tpu")
        return add.T, uw_out.T[128:, :]

    reim = fft_ops.rfft256_packed(uw)  # [258, C] = [re | im], one matmul
    Xre = reim[:fft_ops.NBINS, :]
    Xim = reim[fft_ops.NBINS:, :]

    # Band edges (mbe_unvoiced_fft.c:643-661), [57, C] for the counts only;
    # per-bin membership goes through the exact band map (band_of_bins).
    mult = M_256_OVER_2PI * cur_w0  # [C]
    lf = jnp.asarray(_L_IDX_F)[:, None]
    a_min = jnp.maximum(jnp.ceil((lf - 0.5) * mult[None, :]), 0.0)
    b_max = jnp.minimum(jnp.ceil((lf + 0.5) * mult[None, :]),
                        jnp.float32(FFT_SIZE // 2))
    lmask = band_mask(cur_L) & (cur_Vl == 0)

    band = band_of_bins(cur_w0)  # [129, C]
    mag2 = Xre * Xre + Xim * Xim  # [129, C]
    windowed = os.environ.get("MBE_TPU_UNVOICED_BANDS", "windowed") \
        == "windowed"
    if windowed:
        # static per-band bin windows (_band_windows): bins outside can
        # never match band == l, so the restricted sums keep exactly the
        # same nonzero terms while doing ~45% fewer element ops than the
        # dense [57, 129, C] compare-reduce. NOT bitwise: XLA's reduce
        # tree associates the shorter sum differently (measured <= 1e-5
        # rel on the band energies — float-synthesis territory, the same
        # class as a compiler upgrade; bit-domain outputs untouched, SNR
        # goldens unchanged). The bin_scalor tiles below ARE bitwise
        # (selects only).
        band_win, tile_bands = _band_windows()
        rows = []
        for l in range(57):
            lo, hi = band_win[l]
            seg = jnp.where(band[lo:hi] == jnp.float32(l),
                            mag2[lo:hi], 0.0)
            rows.append(jnp.sum(seg, axis=0, keepdims=True))
        numerator = jnp.concatenate(rows, axis=0)  # [57, C]
    else:
        eq = band[None, :, :] == lf[:, :1][..., None]  # [57,129,C], fuses
        numerator = jnp.sum(jnp.where(eq, mag2[None, :, :], 0.0),
                            axis=1)  # [57, C]
    bin_count = b_max - a_min
    ok = lmask & (bin_count > 0) & (numerator > 1e-10)
    denom = jnp.where(bin_count > 0, bin_count, 1.0)
    mean = numerator / denom
    scalor = UNVOICED_SCALE_COEFF * cur_Ml / jnp.sqrt(jnp.where(mean > 0, mean, 1.0))
    scalor = jnp.where(ok, scalor, 0.0)

    # per-band scalor -> bins: select chain over the band map (each bin
    # reads exactly one band; gated scalor is already 0 for non-ok bands)
    if windowed:
        # per-bin-tile candidate bands: tile [8t, 8t+8) can only match
        # bands in its static window, so each [8, C] row runs ~22 selects
        # instead of 57
        tiles = []
        for t, cands in enumerate(tile_bands):
            lo, hi = 8 * t, min(8 * t + 8, FFT_SIZE // 2 + 1)
            seg = jnp.zeros_like(mag2[lo:hi])
            for l in cands:
                seg = jnp.where(band[lo:hi] == jnp.float32(l),
                                scalor[l:l + 1, :], seg)
            tiles.append(seg)
        bin_scalor = jnp.concatenate(tiles, axis=0)
    else:
        bin_scalor = jnp.zeros_like(mag2)
        for l in range(57):
            bin_scalor = jnp.where(band == jnp.float32(l),
                                   scalor[l:l + 1, :], bin_scalor)
    scal2 = jnp.concatenate([bin_scalor, bin_scalor], axis=0)  # [258, C]
    uw_out = fft_ops.irfft256_packed(reim * scal2)  # [256, C], one matmul

    # WOLA combine (mbe_unvoiced_fft.c:343-530)
    zeros32 = jnp.zeros((32, uw_out.shape[1]), jnp.float32)
    prev_part = jnp.concatenate([previous_uw, zeros32], axis=0)
    curr_part = jnp.concatenate([zeros32, uw_out[:128, :]], axis=0)
    wp = jnp.asarray(_W_PREV)[:, None]
    wc = jnp.asarray(_W_CURR)[:, None]
    dn = jnp.asarray(_W_DENOM)[:, None]
    add = jnp.where(dn > 1e-10, (wp * prev_part + wc * curr_part) / dn, 0.0)
    return add, uw_out[128:, :]


# ---------------------------------------------------------------------------
# Tone synthesis (mbelib.c:691-856)
# ---------------------------------------------------------------------------

def parse_tone_fields(ambe_d):
    """AD / ID1 extraction from 49 AMBE bits (mbelib.c:760-789).

    ambe_d: [49, C] (channel-minor). Returns (AD [C] i32, ID1 [C] i32)."""
    d = ambe_d.astype(jnp.int32)
    w12 = jnp.asarray(1 << np.arange(11, -1, -1, dtype=np.int64),
                      jnp.int32)[:, None]
    u0 = jnp.sum(d[0:12, :] * w12, axis=0)
    u1 = jnp.sum(d[12:24, :] * w12, axis=0)
    w14 = jnp.asarray(1 << np.arange(13, -1, -1, dtype=np.int64),
                      jnp.int32)[:, None]
    u3 = jnp.sum(d[35:49, :] * w14, axis=0)
    ad = ((u0 & 0x3F) << 1) + ((u3 >> 4) & 0x1)
    id1 = (u1 & 0xFFF) >> 4
    return ad, id1


def render_tone(tone_id, amplitude_id, swn, tone_phase):
    """mbe_renderTonef (mbelib.c:707-736), batched with exact uint32 phases.

    Silence (all-zero output, state unchanged) for invalid tone ids or
    freq1 <= 0. Returns (samples [160, C], swn', tonePhase').
    """
    _lazy_tables()
    tid = jnp.clip(tone_id, 0, 255)
    # all per-tone-id tables in ONE exact one-hot bf16 matmul (_TONE_LUT
    # construction comments above; dynamic gathers cost ~0.25 ms per
    # [C]-shaped take at C=32768, and five separate lut1d compare-reduces
    # each re-stream their own [256, C] compare)
    onehot = (jnp.arange(256, dtype=jnp.int32)[:, None] == tid[None, :]
              ).astype(jnp.bfloat16)  # [256, C]
    lut = jnp.matmul(jnp.asarray(_TONE_LUT, jnp.bfloat16), onehot,
                     preferred_element_type=jnp.float32)  # [10, C]
    active = lut[0] > 0.0
    dual = lut[1] > 0.0

    def _u32(limbs):  # [4, C] exact 8-bit limb floats -> uint32
        w = limbs.astype(jnp.uint32)
        return w[0] | (w[1] << 8) | (w[2] << 16) | (w[3] << 24)

    step1 = _u32(lut[2:6])   # pre-masked to 0 unless active
    step2 = _u32(lut[6:10])  # pre-masked to 0 unless active & dual
    gain = (jnp.maximum(amplitude_id, 0).astype(jnp.float32) / jnp.float32(127.0)) * SOFT_CLIP

    # Angle-addition factorization n = 16a + b: the naive form evaluates a
    # [C,160] uint32 phase grid plus a [C,160] sin per oscillator (~1.5 ms
    # at C=32768); instead take 10 anchor phases per oscillator with EXACT
    # wrapped-uint32 arithmetic (the same mod-2^32 accumulator as the
    # reference, mbelib.c:707-736), 16 small offsets b*step*rad (< 95 rad,
    # so f32-accurate), and combine with sin(x+y) = sin x cos y + cos x
    # sin y — 104 transcendentals/channel instead of 320, no grids.
    rad = jnp.float32(2.0 * np.pi / 4294967296.0)
    anchors = (jnp.arange(10, dtype=jnp.uint32) * 16 + 1)[:, None]  # nn @ b=0
    boff = jnp.arange(16, dtype=jnp.float32)[:, None]

    def osc_terms(phase0, step):
        pha = phase0[None, :] + step[None, :] * anchors   # [10,C] exact u32
        tha = pha.astype(jnp.float32) * rad - jnp.float32(np.pi / 2.0)
        sa, ca = jnp.sin(tha), jnp.cos(tha)               # [10, C]
        bs = step.astype(jnp.float32)[None, :] * rad * boff  # [16, C]
        return sa, ca, jnp.cos(bs), jnp.sin(bs)

    # One combined outer-product expression instead of two materialized
    # [160,C] oscillator buffers + two [160,C] where-merges: fold the
    # dual/active selects into per-oscillator scalar gains (g2 == 0 kills
    # osc 2 exactly; g1 == g2 == 0 mutes inactive lanes exactly — finite
    # sin/cos, so 0*x + 0*y is an exact signed zero) and emit ONE fused
    # [10,16,C] -> [160,C] store. Bit-identical to the two-buffer form:
    # per element the f32 op order is unchanged (sa*cb + ca*sb, then
    # g1*s1 + g2*s2 with g1 = 0.5*gain precomputed, the same left-assoc
    # products), and lanes the old path where'd to 0.0 now compute +/-0.
    # Measured 1.04x on ambe2400 hard C=32768 (tone render ~0.26 ms ->
    # ~0.15 ms of pure HBM-traffic savings; see docs/PERFORMANCE.md).
    sa1, ca1, cb1, sb1 = osc_terms(swn, step1)
    sa2, ca2, cb2, sb2 = osc_terms(tone_phase, step2)
    g1 = jnp.where(active, jnp.where(dual, 0.5 * gain, gain), 0.0)[None, None, :]
    g2 = jnp.where(active & dual, 0.5 * gain, 0.0)[None, None, :]
    s1 = sa1[:, None, :] * cb1[None, :, :] + ca1[:, None, :] * sb1[None, :, :]
    s2 = sa2[:, None, :] * cb2[None, :, :] + ca2[:, None, :] * sb2[None, :, :]
    samples = (g1 * s1 + g2 * s2).reshape(FRAME, tid.shape[0])

    # exact uint32 phase-accumulator state update (no [C,160] grid needed)
    n160 = jnp.uint32(FRAME)
    new_swn = jnp.where(active, swn + step1 * n160, swn)
    new_tp = jnp.where(active & dual, tone_phase + step2 * n160, tone_phase)
    return samples, new_swn, new_tp


def dstar_tone_id(ambe_d):
    """AMBE2400 scrambled tone index (ambe3600x2400.c:177-199).
    ambe_d: [49, C] (channel-minor)."""
    d = ambe_d.astype(jnp.int32)
    defv = (d[6] << 2) | (d[7] << 1) | d[8]
    t7 = bit_ops.lut1d(defv, np.asarray(T.dstar_t7tab, np.int32))
    t6 = bit_ops.lut1d(defv, np.asarray(T.dstar_t6tab, np.int32))
    t5 = bit_ops.lut1d(defv, np.asarray(T.dstar_t5tab, np.int32))
    return ((t7 << 7) | (t6 << 6) | (t5 << 5) | (d[9] << 4)
            | (d[42] << 3) | (d[43] << 2) | (d[10] << 1) | d[11])


# ---------------------------------------------------------------------------
# Output conversion (mbelib.c:669-689, 1148-1321) — hot loop #3
# ---------------------------------------------------------------------------

def clip_float(samples):
    """Soft clip at (32767*0.95)/7 in float scale (mbelib.c:669-689)."""
    return jnp.clip(samples, -SOFT_CLIP, SOFT_CLIP)


def float_to_short(samples):
    """mbe_floattoshort (mbelib.c:1148-1321): gain 7, clip ±32767*0.95,
    NaN -> 0, ±Inf -> ±clip, truncation toward zero like the C cast."""
    max_amp = jnp.float32(32767.0 * 0.95)
    x = samples
    is_nan = jnp.isnan(x)
    is_inf = jnp.isinf(x)
    audio = jnp.clip(jnp.float32(7.0) * x, -max_amp, max_amp)
    audio = jnp.where(is_inf, jnp.sign(x) * max_amp, audio)
    audio = jnp.where(is_nan, 0.0, audio)
    return jnp.trunc(audio).astype(jnp.int16)
