"""ECC kernels vs reference golden vectors — must be bit-exact
(mirrors tests/test_ecc.c of the reference)."""

import jax
import numpy as np

from mbe_tpu.ops import ecc


def test_golay_hamming_bit_exact(vectors):
    v = vectors("ecc")

    @jax.jit
    def run(b23, r23, b15, r15):
        return (ecc.golay2312_hard(b23), ecc.golay2312_soft(b23, r23),
                ecc.hamming1511_hard(b15, False),
                ecc.hamming1511_hard(b15, True),
                ecc.hamming1511_soft(b15, r15, False),
                ecc.hamming1511_soft(b15, r15, True))

    (gh, gs, hh, hh7, hs, hs7) = jax.tree.map(
        np.asarray,
        run(v["golay_in"], v["golay_rel"], v["ham_in"], v["ham_rel"]))

    np.testing.assert_array_equal(gh[0], v["golay_hard_out"])
    np.testing.assert_array_equal(gh[1], v["golay_hard_errs"])
    np.testing.assert_array_equal(gs[0], v["golay_soft_out"])
    np.testing.assert_array_equal(gs[1], v["golay_soft_errs"])
    np.testing.assert_array_equal(hh[0], v["ham_hard_out"])
    np.testing.assert_array_equal(hh[1], v["ham_hard_errs"])
    np.testing.assert_array_equal(hh7[0], v["ham7100_hard_out"])
    np.testing.assert_array_equal(hh7[1], v["ham7100_hard_errs"])
    np.testing.assert_array_equal(hs[0], v["ham_soft_out"])
    np.testing.assert_array_equal(hs[1], v["ham_soft_errs"])
    np.testing.assert_array_equal(hs7[0], v["ham7100_soft_out"])
    np.testing.assert_array_equal(hs7[1], v["ham7100_soft_errs"])


def test_golay_roundtrip_with_injected_errors():
    """Clean codewords decode with 0 errors; <=3 flipped bits are corrected
    (test_ecc.c round-trip strategy)."""
    from mbe_tpu.tables import T
    rng = np.random.default_rng(3)
    cw = np.asarray(T.golay_codewords[rng.integers(0, 4096, 64)], np.int32)
    clean = cw.copy()
    corrupted = cw.copy()
    for i in range(64):
        nerr = rng.integers(0, 4)
        pos = rng.choice(23, size=nerr, replace=False)
        corrupted[i, pos] ^= 1

    @jax.jit
    def run(a, b):
        return ecc.golay2312_hard(a), ecc.golay2312_hard(b)

    (o1, e1), (o2, _e2) = jax.tree.map(np.asarray, run(clean, corrupted))
    np.testing.assert_array_equal(e1, 0)
    np.testing.assert_array_equal(o1[:, 11:], clean[:, 11:])
    # data bits always recovered for <=3 total bit errors
    np.testing.assert_array_equal(o2[:, 11:], clean[:, 11:])
