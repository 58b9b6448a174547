"""StreamingDecoder produces exactly the same PCM/results as direct
pipeline.step calls, frame for frame (including the byte-packed input and
the in-flight window ordering)."""

import jax
import numpy as np

from mbe_tpu import pipeline
from mbe_tpu.models import state as st
from mbe_tpu.ops import synth
from mbe_tpu.parallel.streaming import StreamingDecoder


def test_streaming_matches_direct_steps():
    C, T = 8, 6
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 2, (T, C, 4, 24)).astype(np.int32)
    seeds = np.arange(1, C + 1).astype(np.uint32)

    # direct
    state = st.init_state(C, rng_seed=seeds)
    step = jax.jit(lambda f, s: pipeline.step("ambe2450", f, s))
    direct = []
    for t in range(T):
        state, audio, res, _ = step(frames[t], state)
        direct.append((np.asarray(synth.float_to_short(audio)),
                       np.asarray(res["total_errors"])))

    # streaming with packed bytes
    dec = StreamingDecoder("ambe2450", C, rng_seed=seeds)
    got = []
    for t in range(T):
        packed = np.packbits(frames[t].reshape(C, 96).astype(np.uint8),
                             axis=1)
        for pcm16, res in dec.push(packed):
            got.append((pcm16, res["total_errors"]))
    for pcm16, res in dec.flush():
        got.append((pcm16, res["total_errors"]))

    assert len(got) == T
    for t in range(T):
        np.testing.assert_array_equal(got[t][0], direct[t][0], err_msg=f"t={t}")
        np.testing.assert_array_equal(got[t][1], direct[t][1])


def test_run_sequence_unroll_parity():
    """lax.scan unroll repeats the same step graph per iteration, so all
    bit-domain outputs (error counts, flags, integer state) must be
    EXACTLY equal. Float PCM/state may differ at the XLA
    excess-precision/fusion level (measured <=1.5e-4 rel on CPU) -- the
    same tolerance class as any compiler upgrade; assert >=70 dB here.
    Guards the bench/production `unroll` knob (docs/PERFORMANCE.md)."""
    C, T = 8, 6
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 2, (T, C, 8, 23)).astype(np.int32)
    seeds = np.arange(1, C + 1).astype(np.uint32)

    outs = {}
    for unroll in (1, 2):
        state = st.init_state(C, rng_seed=seeds)
        run = jax.jit(lambda fr, s, u=unroll: pipeline.run_sequence(
            "imbe7200", fr, s, unroll=u))
        state, pcm, res = run(frames, state)
        outs[unroll] = (np.asarray(pcm),
                        jax.tree.map(np.asarray, res),
                        jax.tree.map(np.asarray, state))

    pcm1, res1, st1 = outs[1]
    pcm2, res2, st2 = outs[2]
    for k in res1:
        np.testing.assert_array_equal(res1[k], res2[k], err_msg=k)
    err = np.sum((pcm1 - pcm2) ** 2)
    sig = np.sum(pcm1 ** 2)
    snr = 10 * np.log10(sig / err) if err > 0 else np.inf
    assert snr >= 70.0, f"unroll PCM SNR {snr:.1f} dB"
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
