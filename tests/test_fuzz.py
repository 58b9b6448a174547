"""Fuzz-style robustness (mirrors fuzz/fuzz_process_frame.cc +
fuzz_frame_decode.cc): arbitrary random frames never produce NaN/Inf PCM or
out-of-range error counts, and invalid bit values are rejected on the host
path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbe_tpu import api, pipeline
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


# --- API-boundary fuzzing with deliberately invalid inputs ------------------
# Mirrors fuzz/fuzz_process_frame.cc:28-66 (raw_bits mode feeds arbitrary
# bytes 0..255) and fuzz_frame_decode.cc. Host (numpy) inputs must raise;
# traced inputs bypass validation by design and the jitted kernels must stay
# finite with bounded error counts.

RAW_VALUES = np.array([0, 1, 2, 127, 255, -1, -128], np.int32)


def _raw_array(rng, shape):
    return rng.choice(RAW_VALUES, size=shape).astype(np.int32)


@pytest.mark.parametrize("name,fn,shape", [
    ("imbe7200", lambda f, s: api.process_imbe7200x4400_framef(f, s), (8, 23)),
    ("ambe2450", lambda f, s: api.process_ambe3600x2450_framef(f, s), (4, 24)),
])
def test_raw_byte_frames_rejected_on_host(name, fn, shape):
    rng = np.random.default_rng(7)
    st_ = st.init_state(2)
    for _ in range(8):
        frame = _raw_array(rng, (2,) + shape)
        if not ((frame == 0) | (frame == 1)).all():
            with pytest.raises(api.MbeInvalidBits):
                fn(frame, st_)


def test_raw_byte_dbits_rejected_on_host():
    """The reference Dataf paths call mbe_validate_bits on the parameter
    bits (ambe3600x2450.c:728, imbe 4400 prepare); ours must too."""
    st_ = st.init_state(1)
    te = np.zeros(1, np.int32)
    bad49 = np.zeros((1, 49), np.int32)
    bad49[0, 3] = 255
    with pytest.raises(api.MbeInvalidBits):
        api.process_ambe2450_dataf(bad49, st_, te)
    with pytest.raises(api.MbeInvalidBits):
        api.process_ambe2400_dataf(bad49, st_, te)
    bad88 = np.zeros((1, 88), np.int32)
    bad88[0, 80] = -1
    with pytest.raises(api.MbeInvalidBits):
        api.process_imbe4400_dataf(bad88, st_, te)


def test_inconsistent_result_counters_rejected():
    """mbe_result_resolve_total_errors semantics on Data entry
    (mbe_result.h:76-114)."""
    st_ = st.init_state(1)
    d = np.zeros((1, 49), np.int32)
    with pytest.raises(api.MbeInvalidArgument):  # out of range
        api.process_ambe2450_dataf(d, st_, np.array([185], np.int32))
    with pytest.raises(api.MbeInvalidArgument):  # negative
        api.process_ambe2450_dataf(d, st_, np.array([-1], np.int32))
    with pytest.raises(api.MbeInvalidArgument):  # total < c0 component
        api.process_ambe2450_dataf(d, st_, np.array([1], np.int32),
                                   c0_errors=np.array([3], np.int32))
    # total==0 with nonzero c0 resolves to c0 rather than raising
    audio, _, _ = api.process_ambe2450_dataf(
        d, st_, np.array([0], np.int32), c0_errors=np.array([2], np.int32))
    assert np.isfinite(np.asarray(audio)).all()


def test_out_of_range_soft_reliability_rejected_on_host():
    frame = np.zeros((1, 4, 24), np.int32)
    rel = np.full((1, 4, 24), 255, np.int32)
    rel[0, 0, 0] = 256
    with pytest.raises(api.MbeInvalidArgument):
        api.process_ambe3600x2450_framef(frame, st.init_state(1), rel)
    rel[0, 0, 0] = -7
    with pytest.raises(api.MbeInvalidArgument):
        api.process_ambe3600x2450_framef(frame, st.init_state(1), rel)


@pytest.mark.parametrize("codec", ["ambe2450", "ambe2400", "imbe7200",
                                   "imbe7100"])
def test_jitted_kernels_total_on_raw_bytes(codec):
    """Traced inputs bypass host validation by design (api.py _process);
    the kernels themselves must stay total: finite PCM, bounded counts,
    sane state — even on 0/255-valued 'bits'."""
    rows, cols = pipeline.FRAME_SHAPES[codec]
    C, T = 4, 6
    rng = np.random.default_rng(1234)
    frames = jnp.asarray(_raw_array(rng, (T, C, rows, cols)))
    state = st.init_state(C, rng_seed=np.uint32(5))
    run = jax.jit(lambda fr, s: pipeline.run_sequence(codec, fr, s))
    state, pcm, res = run(frames, state)
    pcm = np.asarray(pcm)
    assert np.isfinite(pcm).all()
    total = np.asarray(res["total_errors"])
    assert (total >= 0).all() and (total <= 184).all()
    assert np.isfinite(np.asarray(state.cur.Ml)).all()
    assert np.isfinite(np.asarray(state.cur.errorRate)).all()
    assert ((np.asarray(state.cur.L) >= 1)
            & (np.asarray(state.cur.L) <= 56)).all()


def test_invalid_lane_isolation(vectors):
    """A garbage lane must not perturb valid lanes: silence + rolled-back
    state + status=-2 on the bad lane, bit-identical results elsewhere."""
    vec = vectors("e2e_ambe2450")
    frame = vec["frames"][0][:2].copy()  # two valid channels
    state = st.init_state(2, rng_seed=vec["seeds"][:2])

    st_ref, audio_ref, res_ref, _ = pipeline.step("ambe2450",
                                                  jnp.asarray(frame), state)

    bad = frame.copy()
    bad[1, 2, 5] = 200  # corrupt lane 1 only
    st_mix, audio_mix, res_mix, _ = pipeline.step("ambe2450",
                                                  jnp.asarray(bad), state)

    np.testing.assert_array_equal(np.asarray(audio_mix[0]),
                                  np.asarray(audio_ref[0]))
    np.testing.assert_array_equal(np.asarray(audio_mix[1]), 0.0)
    assert int(np.asarray(res_mix["status"])[0]) == 0
    assert int(np.asarray(res_mix["status"])[1]) == -2
    assert int(np.asarray(res_mix["total_errors"])[1]) == 0
    # lane 1 state rolled back to its pre-step value (channel axis is
    # trailing on state leaves)
    ok = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a)[..., 1],
                                    np.asarray(b)[..., 1]),
        st_mix, state)
    assert all(jax.tree.leaves(ok))
    # lane 0 state identical to the all-valid run
    ok0 = jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a)[..., 0],
                                    np.asarray(b)[..., 0]),
        st_mix, st_ref)
    assert all(jax.tree.leaves(ok0))


def test_jitted_soft_path_total_on_garbage_reliabilities():
    C, T = 4, 4
    rng = np.random.default_rng(77)
    frames = jnp.asarray(rng.integers(0, 2, (T, C, 4, 24)).astype(np.int32))
    rel = jnp.asarray(rng.choice(
        np.array([-1000000, -1, 0, 255, 256, 2**30], np.int32),
        size=(T, C, 4, 24)).astype(np.int32))
    state = st.init_state(C, rng_seed=np.uint32(9))
    run = jax.jit(lambda fr, r, s: pipeline.run_sequence(
        "ambe2450", fr, s, soft_rel=r))
    state, pcm, res = run(frames, rel, state)
    assert np.isfinite(np.asarray(pcm)).all()
    total = np.asarray(res["total_errors"])
    assert (total >= 0).all() and (total <= 184).all()


# --- opt-in continuous fuzz loop (ClusterFuzzLite analog) -------------------
# The reference runs libFuzzer continuously on PRs (.clusterfuzzlite/,
# fuzz_process_frame.cc:28-66). The fixed-seed tests above are the
# regression tier; this loop is the coverage tier: MBE_TPU_FUZZ_SEEDS=N
# re-runs the kernel-totality invariants over N fresh random seeds with
# randomized codec / batch size / bit distribution per iteration. One jit
# per (codec, C) pair is reused across seeds, so N=50 costs seconds, not
# compiles. CI's fuzz job sets N=50.

import os as _os

_FUZZ_N = int(_os.environ.get("MBE_TPU_FUZZ_SEEDS", "0"))


@pytest.mark.skipif(_FUZZ_N <= 0,
                    reason="opt-in: set MBE_TPU_FUZZ_SEEDS=<n>")
def test_fuzz_loop_random_seeds():
    meta_rng = np.random.default_rng()  # OS entropy — a different run each time
    seeds = meta_rng.integers(0, 2**63, _FUZZ_N)
    runs = {}
    batches = (1, 8)  # two sizes keep the distinct-jit count CI-friendly
    for i, s in enumerate(seeds):
        rng = np.random.default_rng(s)
        codec = ("imbe7200", "imbe7100", "ambe2450",
                 "ambe2400")[int(rng.integers(4))]
        C = batches[int(rng.integers(len(batches)))]
        rows, cols = pipeline.FRAME_SHAPES[codec]
        T = 6
        # mix plain bits, raw bytes, and biased-toward-valid frames
        mode = int(rng.integers(3))
        if mode == 0:
            frames = rng.integers(0, 2, (T, C, rows, cols)).astype(np.int32)
        elif mode == 1:
            frames = _raw_array(rng, (T, C, rows, cols))
        else:
            frames = rng.choice(
                np.array([0, 1, 1, 1, 0, 0, 2], np.int32),
                size=(T, C, rows, cols)).astype(np.int32)
        key = (codec, C)
        if key not in runs:
            runs[key] = jax.jit(
                lambda fr, s, _c=codec: pipeline.run_sequence(_c, fr, s))
        state = st.init_state(
            C, rng_seed=rng.integers(0, 2**32, C).astype(np.uint32))
        state, pcm, res = runs[key](jnp.asarray(frames), state)
        pcm = np.asarray(pcm)
        ctx = f"seed={s} codec={codec} C={C} mode={mode} (iter {i})"
        assert np.isfinite(pcm).all(), ctx
        assert np.abs(pcm).max() <= np.float32((32767.0 * 0.95) / 7.0) + 1e-3, ctx
        total = np.asarray(res["total_errors"])
        assert (total >= 0).all() and (total <= 184).all(), ctx
        status = np.asarray(res["status"])
        assert np.isin(status, (0, -2)).all(), ctx
        assert np.isfinite(np.asarray(state.cur.Ml)).all(), ctx
        assert np.isfinite(np.asarray(state.cur.errorRate)).all(), ctx
        assert ((np.asarray(state.cur.L) >= 1)
                & (np.asarray(state.cur.L) <= 56)).all(), ctx
