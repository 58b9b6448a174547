"""Public API surface: mirrors tests/test_api.c (version, result formatting,
soft-bit constructors) plus API-level invariants."""

import numpy as np

import mbe_tpu
from mbe_tpu import api


def test_version_string():
    assert isinstance(mbe_tpu.version_string(), str)
    assert mbe_tpu.version_string()


def test_format_process_result():
    """'='*errors then E,T,R,M in that order (mbelib.c:69-104)."""
    res = dict(total_errors=3,
               flags=api.PROCESS_FLAG_REPEAT | api.PROCESS_FLAG_MUTE)
    assert api.format_process_result(res) == "===RM"
    res = dict(total_errors=0, flags=api.PROCESS_FLAG_ERASURE
               | api.PROCESS_FLAG_TONE)
    assert api.format_process_result(res) == "ET"
    # truncation (test_params.c:705-715)
    res = dict(total_errors=10, flags=api.PROCESS_FLAG_MUTE)
    assert api.format_process_result(res, size=5) == "===="
    res = dict(total_errors=-2, flags=0)
    assert api.format_process_result(res) == ""


def test_soft_bit_constructors():
    """mbe_softBitFromLlr: positive -> 1, |llr| clamped to 255
    (mbelib.c:125-132)."""
    bit, rel = api.soft_bit_from_llr(np.array([300, -300, 0, 5, -5]))
    np.testing.assert_array_equal(np.asarray(bit), [1, 0, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(rel), [255, 255, 0, 5, 5])

    bit, rel = api.soft_bits_from_hard(np.array([0, 1, 1]), 200)
    np.testing.assert_array_equal(np.asarray(bit), [0, 1, 1])
    np.testing.assert_array_equal(np.asarray(rel), [200, 200, 200])


def test_init_state_shapes():
    st = api.init_mbe_parms(channels=3)
    # state leaves are channel-minor (models/state.py round-3 layout)
    assert st.cur.Ml.shape == (57, 3)
    assert st.cur.previousUw.shape == (128, 3)
    assert st.comfort_rng.shape == (3, 3)  # [3 limbs, C]
    # IMBE defaults (mbelib.c:367-410)
    assert int(st.prev.L[0]) == 39 and int(st.prev.K[0]) == 12
    assert float(st.prev.noiseSeed[0]) == -1.0
    np.testing.assert_allclose(float(st.prev.mutingThreshold[0]), 0.0875,
                               rtol=1e-6)


def test_validate_bits_host():
    from mbe_tpu.ops import bits
    assert bits.validate_bits_host(np.array([0, 1, 1, 0])) == 0
    assert bits.validate_bits_host(np.array([0, 2])) == bits.STATUS_INVALID_BITS
