"""Frame-level FSM golden sequences: crafted tone/silence/erasure/repeat
parameter bits ENCODED back into full over-the-air frames (C0 Golay +
PRNG scrambling + controlled data-bit error injection) and processed
through the complete frame path — unlike test_fsm_e2e.py these exercise
the tone classifier and repeat rules behind real ECC error counts.
Golden: tools/gen_frame_fsm_vectors.py vs the reference mbe_process*Framef."""

import jax
import numpy as np
import pytest

from mbe_tpu import api
from mbe_tpu.models import state as st

from conftest import snr_db

PROCESS = {
    "ambe2450": api.process_ambe3600x2450_framef,
    "ambe2400": api.process_ambe3600x2400_framef,
    "imbe7200": api.process_imbe7200x4400_framef,
    "imbe7100": api.process_imbe7100x4400_framef,
}

EXPECT_PATHS = {
    "ambe2450": {"tone", "erasure", "repeat", "mute"},
    "ambe2400": {"tone", "repeat", "mute"},
    "imbe7200": {"repeat", "mute"},
    "imbe7100": {"repeat", "mute"},
}

FLAG_BITS = (("tone", api.PROCESS_FLAG_TONE),
             ("erasure", api.PROCESS_FLAG_ERASURE),
             ("repeat", api.PROCESS_FLAG_REPEAT),
             ("mute", api.PROCESS_FLAG_MUTE))


@pytest.mark.parametrize("codec", ["ambe2450", "ambe2400", "imbe7200",
                                   "imbe7100"])
def test_frame_fsm_paths_match_reference(vectors, codec):
    vec = vectors(f"fsm_frames_{codec}")
    frames = vec["frames"]
    T = frames.shape[0]

    state = st.init_state(1, rng_seed=np.uint32(vec["seed"]))
    fn = PROCESS[codec]
    run = jax.jit(lambda f, s: fn(f, s))

    hit = set()
    for t in range(T):
        state, audio, res, _ = run(frames[t][None], state)
        audio = np.asarray(audio)[0]

        got = int(np.asarray(res["flags"])[0])
        want = int(vec["flags"][t])
        assert got == want, f"t={t}: flags {got:#x} != ref {want:#x}"
        for name, bit in FLAG_BITS:
            if got & bit:
                hit.add(name)

        # error counters from the real ECC chain must match exactly
        np.testing.assert_array_equal(
            [int(np.asarray(res[k])[0]) for k in
             ("c0_errors", "protected_errors", "c4_errors", "total_errors")],
            vec["res"][t], err_msg=f"t={t} error counters")

        s = snr_db(vec["pcm"][t], audio)
        assert s >= 60.0, f"t={t}: SNR {s:.1f} dB (flags {got:#x})"

    assert hit >= EXPECT_PATHS[codec], f"paths missing: {EXPECT_PATHS[codec] - hit}"
