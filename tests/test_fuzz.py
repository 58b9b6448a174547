"""Fuzz-style robustness (mirrors fuzz/fuzz_process_frame.cc +
fuzz_frame_decode.cc): arbitrary random frames never produce NaN/Inf PCM or
out-of-range error counts, and invalid bit values are rejected on the host
path."""

import jax
import numpy as np
import pytest

from mbe_tpu import pipeline
from mbe_tpu.models import state as st
from mbe_tpu.ops import bits


@pytest.mark.parametrize("codec", ["ambe2450", "imbe7200"])
def test_random_frames_stay_finite(codec):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    C, T = 8, 12
    rng = np.random.default_rng(99)
    frames = rng.integers(0, 2, (T, C, rows, cols)).astype(np.int32)
    state = st.init_state(C, rng_seed=rng.integers(1, 2**31, C).astype(np.uint32))

    run = jax.jit(lambda fr, s: pipeline.run_sequence(codec, fr, s))
    state, pcm, res = run(frames, state)
    pcm = np.asarray(pcm)
    assert np.isfinite(pcm).all()
    assert np.abs(pcm).max() <= np.float32((32767.0 * 0.95) / 7.0) + 1e-3
    total = np.asarray(res["total_errors"])
    assert (total >= 0).all() and (total <= 184).all()
    # state stays finite and within model bounds
    assert np.isfinite(np.asarray(state.cur.Ml)).all()
    assert ((np.asarray(state.cur.L) >= 1)
            & (np.asarray(state.cur.L) <= 56)).all()


def test_invalid_bits_rejected_on_host():
    """Value-2 bits are rejected with MBE_STATUS_INVALID_BITS before any
    state mutation (tests/test_input_validation.c:72-100)."""
    bad = np.zeros((4, 24), np.int32)
    bad[0, 0] = 2
    assert bits.validate_bits_host(bad) == bits.STATUS_INVALID_BITS
    assert bits.validate_soft_bits_host(bad) == bits.STATUS_INVALID_BITS
    good = np.ones((4, 24), np.int32)
    assert bits.validate_bits_host(good) == 0
