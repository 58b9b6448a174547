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
