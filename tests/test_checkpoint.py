"""Checkpoint/resume (utils/checkpoint.py, SURVEY.md §5).

The complete sequential state lives in the ChannelState pytree, so a
mid-stream save → load → continue must reproduce the uninterrupted run
bit-for-bit — phases, WOLA overlap, LCG positions, comfort-noise RNG
limbs, error IIRs all round-trip through the npz."""

import dataclasses

import numpy as np

from mbe_tpu import api
from mbe_tpu.models import state as st
from mbe_tpu.utils import checkpoint


def _run(frames, state, start, stop):
    pcm = []
    for t in range(start, stop):
        state, audio, res, _ = api.process_imbe7200x4400_framef(
            frames[t], state)
        pcm.append(np.asarray(audio))
    return state, pcm


def test_checkpoint_roundtrip_bitexact(vectors, tmp_path):
    vec = vectors("e2e_imbe7200")
    frames = vec["frames"][:6]
    c = frames.shape[1]

    # uninterrupted run
    s = st.init_state(c, rng_seed=vec["seeds"])
    s_ref, pcm_ref = _run(frames, s, 0, 6)

    # run 3 frames, snapshot, reload, continue
    s = st.init_state(c, rng_seed=vec["seeds"])
    s_mid, pcm_a = _run(frames, s, 0, 3)
    path = str(tmp_path / "snap.npz")
    checkpoint.save(path, s_mid)
    s_loaded = checkpoint.load(path)
    s_fin, pcm_b = _run(frames, s_loaded, 3, 6)

    for t, (a, b) in enumerate(zip(pcm_ref, pcm_a + pcm_b)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {t}")
    for name in ("cur", "prev", "enh"):
        pr, pf = getattr(s_ref, name), getattr(s_fin, name)
        if pr is None:
            assert pf is None
            continue
        for f in dataclasses.fields(pr):
            np.testing.assert_array_equal(
                np.asarray(getattr(pr, f.name)),
                np.asarray(getattr(pf, f.name)), err_msg=f"{name}.{f.name}")
    np.testing.assert_array_equal(np.asarray(s_ref.comfort_rng),
                                  np.asarray(s_fin.comfort_rng))
    np.testing.assert_array_equal(np.asarray(s_ref.lcg_prime),
                                  np.asarray(s_fin.lcg_prime))


def test_checkpoint_slim_imbe_carry(tmp_path):
    """carry_enh=False states (enh is None) round-trip too."""
    s = st.init_state(4, carry_enh=False)
    path = str(tmp_path / "slim.npz")
    checkpoint.save(path, s)
    s2 = checkpoint.load(path)
    assert s2.enh is None
    for f in dataclasses.fields(s.cur):
        np.testing.assert_array_equal(np.asarray(getattr(s.cur, f.name)),
                                      np.asarray(getattr(s2.cur, f.name)))
