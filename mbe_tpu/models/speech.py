"""Batched speech synthesis core (mbe_synthesizeSpeechCore, mbelib.c:1042-1105).

Pure function over `Parms` pytrees: all lanes compute the full voiced +
unvoiced + comfort-noise paths; per-lane mute/validity masks select which
results and state updates commit. Matches the reference's exact state
side-effect discipline:

- adaptive smoothing commits even for muted frames (mbelib.c:1057-1064)
- muted frames emit comfort noise and do NOT advance the noise LCG, phases,
  or previousUw (mbelib.c:1069-1073)
- the comfort-noise RNG advances only on lanes that actually emitted it
"""

import dataclasses

import jax.numpy as jnp

from ..ops import enhance, noise, synth
from .state import Parms


def _valid_L(L):
    return (L >= 1) & (L <= 56)


def should_mute(cur: Parms):
    """mbe_should_mute_speech (mbelib.c:895-899)."""
    mute_on_error_rate = jnp.abs(cur.mutingThreshold - jnp.float32(0.096)) > 1e-6
    return (cur.repeatCount >= 4) | (mute_on_error_rate
                                     & (cur.errorRate > cur.mutingThreshold))


def synthesize_speech_core(cur: Parms, prev: Parms, comfort_samples,
                           lcg_prime, rm0):
    """One batched frame of speech synthesis.

    The comfort-noise RNG is owned by the caller: pass this frame's
    precomputed comfort-noise samples; the returned `mute` mask tells the
    caller which lanes consumed them (so it can commit the RNG advance
    exactly once per frame across all comfort-noise consumers).

    Args:
      cur, prev: Parms (prev is prev_mp_enhanced in the process paths).
      comfort_samples: [160, C] f32 comfort noise for this frame.
      lcg_prime: [C] f32 cold-start LCG prime values.
      rm0: [C] f32 pre-enhancement spectral energy (pass the enhance result;
        for the plain mbe_synthesizeSpeechf path pass the Σ Ml² of cur —
        mbe_adaptive.c:151-161).
    Returns:
      (audio [160, C] f32, cur', prev', aux) where aux carries [C] bool
      masks: `mute` (lanes that consumed the comfort samples) and
      `cold_consumed` (lanes whose one-shot LCG seed override was consumed —
      mbe_unvoiced_fft.c:315-318; the caller must reset lcg_prime to 3147 on
      lanes it commits).
    """
    valid = _valid_L(cur.L) & _valid_L(prev.L)

    # --- adaptive smoothing (always, even when muted) --------------------
    Ml_s, Vl_s, local_e, amp_t = enhance.adaptive_smoothing(
        cur.Ml, cur.Vl, cur.L, cur.errorRate, cur.errorCountTotal,
        cur.errorCount4, prev.localEnergy, prev.amplitudeThreshold, rm0)
    cur = dataclasses.replace(
        cur,
        Ml=jnp.where(valid[None, :], Ml_s, cur.Ml),
        Vl=jnp.where(valid[None, :], Vl_s, cur.Vl),
        localEnergy=jnp.where(valid, local_e, cur.localEnergy),
        amplitudeThreshold=jnp.where(valid, amp_t, cur.amplitudeThreshold))

    mute = should_mute(cur) & valid
    speak = valid & ~mute

    # --- noise buffer (LCG state advances on speaking lanes only) ---------
    cold_consumed = speak & (cur.noiseSeed < 0.0)
    noise_buf, new_seed, new_prev_seed = noise.generate_noise_with_overlap(
        cur.noiseSeed, cur.noisePrevSeed, lcg_prime)

    # --- model reconciliation + phase update -------------------------------
    maxl, c_Ml, c_Vl, p_Ml, p_Vl = synth.reconcile_model_lengths(
        cur.L, cur.Ml, cur.Vl, prev.L, prev.Ml, prev.Vl)
    num_uv = synth.count_unvoiced(c_Vl, cur.L)
    c_psi, c_phi, p_psi = synth.update_phases(
        cur.w0, cur.L, cur.PSIl, cur.PHIl, prev.w0, prev.PSIl, noise_buf,
        num_uv)

    # --- voiced + unvoiced render -----------------------------------------
    voiced = synth.render_voiced(cur.w0, c_Ml, c_Vl, c_phi,
                                 prev.w0, p_Ml, p_Vl, prev.PHIl, maxl)
    unvoiced_add, new_uw = synth.unvoiced_fft(
        cur.w0, cur.L, c_Ml, c_Vl, prev.previousUw, noise_buf)
    speech = synth.clip_float(voiced + unvoiced_add)

    audio = jnp.where(speak[None, :], speech,
                      jnp.where(mute[None, :], comfort_samples, 0.0))

    sp = speak[None, :]
    cur = dataclasses.replace(
        cur,
        Ml=jnp.where(sp, c_Ml, cur.Ml),
        Vl=jnp.where(sp, c_Vl, cur.Vl),
        PSIl=jnp.where(sp, c_psi, cur.PSIl),
        PHIl=jnp.where(sp, c_phi, cur.PHIl),
        previousUw=jnp.where(sp, new_uw, cur.previousUw),
        noiseSeed=jnp.where(speak, new_seed, cur.noiseSeed),
        noisePrevSeed=jnp.where(speak, new_prev_seed, cur.noisePrevSeed))
    prev = dataclasses.replace(
        prev,
        Ml=jnp.where(sp, p_Ml, prev.Ml),
        Vl=jnp.where(sp, p_Vl, prev.Vl),
        PSIl=jnp.where(sp, p_psi, prev.PSIl))
    return audio, cur, prev, dict(mute=mute, cold_consumed=cold_consumed)


def current_frame_rm0(cur: Parms):
    """mbe_current_frame_rm0 (mbe_adaptive.c:151-161)."""
    mask = enhance.band_mask(cur.L)
    rm0 = jnp.sum(jnp.where(mask, cur.Ml * cur.Ml, 0.0), axis=0)
    return jnp.where(_valid_L(cur.L), rm0, 0.0)
