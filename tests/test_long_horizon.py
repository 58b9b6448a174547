"""Long-horizon fidelity: 200 consecutive frames through the stateful
decoder must not drift below the 60 dB bar (the sequential state — phases,
WOLA overlap, LCG, log2Ml predictor, error IIR — compounds any numerical
divergence; T=30 vectors would miss slow drift)."""

import jax
import numpy as np
import pytest

from mbe_tpu import pipeline
from mbe_tpu.models import state as st

from conftest import snr_db


@pytest.mark.parametrize("codec", ["imbe7200", "ambe2450"])
def test_no_drift_over_200_frames(vectors, codec):
    vec = vectors(f"long_{codec}")
    frames = vec["frames"]
    T, C = frames.shape[:2]
    state = st.init_state(C, rng_seed=vec["seeds"])

    run = jax.jit(lambda fr, s: pipeline.run_sequence(codec, fr, s))
    state, pcm, results = run(frames, state)
    pcm = np.asarray(pcm)

    np.testing.assert_array_equal(np.asarray(results["flags"]), vec["flags"])
    np.testing.assert_array_equal(np.asarray(results["total_errors"]),
                                  vec["res"][:, :, 3])

    # per-frame SNR for the last quarter must still clear the bar
    worst_tail = np.inf
    for t in range(T):
        for i in range(C):
            s = snr_db(vec["pcm"][t, i], pcm[t, i])
            if t >= 3 * T // 4:
                worst_tail = min(worst_tail, s)
            assert s >= 60.0, f"t={t} lane={i}: SNR {s:.1f} dB"
    # the tail should not be systematically worse than the 60 dB bar either
    assert worst_tail >= 60.0
