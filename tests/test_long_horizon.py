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

    # Per-frame floors. Root causes of the rare sub-60 frames pinned in
    # round 3 (the round-2 "clamp scatter" explanation was wrong — the
    # divergence is NOT confined to rail samples):
    #   - LOUD clipped frames (imbe7100 frame (120,0), 58.5 dB): bounded
    #     f32 rounding in the voiced bank at large cos arguments — error
    #     tracks amplitude, so it only shows on full-scale frames.
    #   - NEAR-SILENT frames (ambe2450 frame (155,3), 59.1 dB, peak 2.7%
    #     of clip): sub-LSB absolute error on a tiny signal; SNR is
    #     relative so the same absolute noise reads as fewer dB. (Not the
    #     DFT precision default: identical under HIGHEST.)
    # Both are transient — neighbors recover immediately, no state drift.
    # The contract below encodes exactly that, so a genuine regression
    # cannot hide behind the allowance:
    #   - every frame >= 55 dB; median >= 60 dB
    #   - sub-60 frames are rare (<= 2 per stream set), transient (same
    #     channel's neighbors >= 60 dB), and either clipped or near-silent
    #     (peak < 10% of clip) — mid-loudness frames keep the 60 dB bound
    snrs = np.array([[snr_db(vec["pcm"][t, i], pcm[t, i])
                      for i in range(C)] for t in range(T)])
    soft_clip = np.float32((32767.0 * 0.95) / 7.0)
    peak = np.abs(vec["pcm"]).max(axis=-1)         # [T, C]
    worst = snrs.min()
    assert worst >= 55.0, f"worst frame SNR {worst:.1f} dB"
    sub60 = list(zip(*np.where(snrs < 60.0)))
    assert len(sub60) <= 2, f"{len(sub60)} sub-60 frames: {sub60}"
    for t, i in sub60:
        frac = peak[t, i] / soft_clip
        assert frac >= 0.999 or frac < 0.1, (
            f"sub-60 frame ({t},{i}) is neither clipped nor near-silent "
            f"(peak {frac:.2f} of clip, {snrs[t, i]:.1f} dB)")
        for tn in (t - 1, t + 1):
            if 0 <= tn < T:
                assert snrs[tn, i] >= 60.0, (
                    f"sub-60 frame ({t},{i}) is not transient: "
                    f"neighbor {tn} at {snrs[tn, i]:.1f} dB")
    assert np.median(snrs) >= 60.0
    tail = snrs[3 * T // 4:]
    assert tail.min() >= 55.0
    assert np.median(tail) >= 60.0, "tail drifting toward the floor"
