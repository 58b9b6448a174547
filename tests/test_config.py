"""DecoderConfig wiring, NOTONES golden parity, and int16_output.

NOTONES golden vectors come from a real DISABLE_AMBE_TONES reference build
(tools/gen_notones_vectors.py, cmake -DNOTONES=ON): tone frames render
silence while classification/flags/state stay identical (mbelib.c:747-751).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbe_tpu import api
from mbe_tpu.models import state as st
from mbe_tpu.utils.config import DecoderConfig

from conftest import snr_db

NOTONES = DecoderConfig(tones_enabled=False)

PROCESS = {
    "ambe2450": api.process_ambe2450_dataf,
    "ambe2400": api.process_ambe2400_dataf,
}


@pytest.mark.parametrize("codec", ["ambe2450", "ambe2400"])
def test_notones_golden(vectors, codec):
    vec = vectors(f"fsm_notones_{codec}")
    dbits, totals = vec["dbits"], vec["totals"]
    state = st.init_state(1, rng_seed=np.uint32(vec["seed"]))
    fn = PROCESS[codec]
    run = jax.jit(lambda d, s, te: fn(d, s, te, config=NOTONES))

    tone_frames = 0
    for t in range(dbits.shape[0]):
        audio, state, fsm = run(dbits[t][None], state,
                                jnp.asarray([totals[t]], jnp.int32))
        audio = np.asarray(audio)[0]
        flags = 0
        for name, bit in (("erasure", api.PROCESS_FLAG_ERASURE),
                          ("tone", api.PROCESS_FLAG_TONE),
                          ("repeat", api.PROCESS_FLAG_REPEAT),
                          ("mute", api.PROCESS_FLAG_MUTE)):
            if name in fsm and bool(np.asarray(fsm[name])[0]):
                flags |= bit
        assert flags == int(vec["flags"][t]), \
            f"t={t}: flags {flags:#x} != ref {int(vec['flags'][t]):#x}"
        if flags == api.PROCESS_FLAG_TONE and np.all(vec["pcm"][t] == 0.0):
            # tone-play frame under NOTONES: exact silence, both sides
            np.testing.assert_array_equal(audio, 0.0)
            tone_frames += 1
        else:
            assert snr_db(vec["pcm"][t], audio) >= 60.0, f"t={t}"
    assert tone_frames >= (2 if codec == "ambe2450" else 0)


def test_notones_tone_state_untouched():
    """A valid tone frame with tones disabled: silence out, flags unchanged
    vs tones-on, and swn/tonePhase not advanced (mbelib.c:747-751 skips
    mbe_renderTonef entirely)."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_fsm_vectors import ambe2450_d

    d0 = ambe2450_d(tone_id=20)
    d0[6:12] = 1  # u0 low 6 bits -> nonzero tone amplitude AD
    d = d0[None]
    te = jnp.zeros((1,), jnp.int32)

    st_on = st.init_state(1, rng_seed=np.uint32(7))
    st_off = st.init_state(1, rng_seed=np.uint32(7))
    audio_on, st2_on, fsm_on = api.process_ambe2450_dataf(d, st_on, te)
    audio_off, st2_off, fsm_off = api.process_ambe2450_dataf(
        d, st_off, te, config=NOTONES)

    assert bool(np.asarray(fsm_on["tone"])[0])
    assert bool(np.asarray(fsm_off["tone"])[0])
    assert np.any(np.asarray(audio_on) != 0.0)
    np.testing.assert_array_equal(np.asarray(audio_off), 0.0)
    # tone accumulator state advanced when enabled, untouched when disabled
    assert int(np.asarray(st2_off.cur.swn)[0]) == int(np.asarray(st_off.cur.swn)[0])
    np.testing.assert_array_equal(np.asarray(st2_off.cur.tonePhase),
                                  np.asarray(st_off.cur.tonePhase))
    assert (int(np.asarray(st2_on.cur.swn)[0])
            != int(np.asarray(st_on.cur.swn)[0])) or np.any(
        np.asarray(st2_on.cur.tonePhase) != np.asarray(st_on.cur.tonePhase))
    # everything except the tone accumulators matches the tones-on run
    for f in dataclasses.fields(st2_on.cur):
        if f.name in ("swn", "tonePhase"):
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(st2_on.cur, f.name)),
            np.asarray(getattr(st2_off.cur, f.name)), err_msg=f.name)


def test_config_framef_wrapper(vectors):
    """config= reaches the full frame path through api.process_*_framef."""
    vec = vectors("e2e_ambe2450")
    frame = vec["frames"][0]
    state = st.init_state(frame.shape[0], rng_seed=vec["seeds"])
    # default and NOTONES configs must agree on non-tone voice frames
    _, audio_def, res_def, _ = api.process_ambe3600x2450_framef(frame, state)
    _, audio_nt, res_nt, _ = api.process_ambe3600x2450_framef(
        frame, state, config=NOTONES)
    np.testing.assert_array_equal(np.asarray(audio_def), np.asarray(audio_nt))
    np.testing.assert_array_equal(np.asarray(res_def["flags"]),
                                  np.asarray(res_nt["flags"]))


def test_config_int16_output(vectors):
    vec = vectors("e2e_imbe7200")
    frame = vec["frames"][0]
    state = st.init_state(frame.shape[0], rng_seed=vec["seeds"])
    cfg = DecoderConfig(int16_output=True)
    _, pcm16, _, _ = api.process_imbe7200x4400_framef(frame, state, config=cfg)
    assert np.asarray(pcm16).dtype == np.int16
    # vs the reference's int16: f32 op-order differences (PARITY.md gap #1)
    # shift a few samples' floats enough that trunc() lands 1 LSB away.
    # Measured on this vector (2026-08-17): max diff 1 on 0.98% of samples
    # (25 of 2560, confined to 3 channels, not amplitude-correlated) —
    # budget 2% with margin, so a real regression (a wrong stage moves
    # whole frames) trips it while boundary scatter does not.
    diff = np.abs(np.asarray(pcm16, np.int32) - vec["pcm16"][0].astype(np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.02, (
        f"max {diff.max()}, frac {(diff > 0).mean():.3f}")
