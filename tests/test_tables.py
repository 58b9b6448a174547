"""Integrity invariants of the extracted table pack (mbe_tpu/data/tables.npz).

Guards against silent corruption on regeneration: algebraic closures that
must hold for any correct extraction, independent of the reference build.
"""

import numpy as np

from mbe_tpu.tables import T


def test_golay_codebook_closure():
    """Every codeword has zero syndrome, and the syndrome of a 1-bit error
    equals that bit's correction mask in golayMatrix."""
    gen = np.asarray(T.golayGenerator, np.int64)
    cw = np.asarray(T.golay_codewords, np.int64)  # [4096, 23]
    assert cw.shape == (4096, 23)

    def syndrome(bits):
        ecc_expected = 0
        for i in range(12):
            if bits[22 - i]:
                ecc_expected ^= int(gen[i])
        ecc = 0
        for j in range(11):
            ecc |= int(bits[j]) << j
        return ecc_expected ^ ecc

    rng = np.random.default_rng(0)
    gm = np.asarray(T.golayMatrix)
    for idx in rng.integers(0, 4096, 32):
        bits = cw[idx].copy()
        assert syndrome(bits) == 0
        # flip one data bit -> golayMatrix must correct exactly that bit
        pos = int(rng.integers(11, 23))
        bits[pos] ^= 1
        s = syndrome(bits)
        assert gm[s] == (1 << (pos - 11))


def test_hamming_codebooks_zero_syndrome():
    for gen_name, cb_name in (("hammingGenerator", "hamming_codewords_std"),
                              ("imbe7100x4400hammingGenerator",
                               "hamming_codewords_7100")):
        gen = np.asarray(getattr(T, gen_name), np.int64)
        cb = np.asarray(getattr(T, cb_name), np.int64)
        assert cb.shape == (2048, 15)
        blocks = (cb << np.arange(15)).sum(axis=1)
        for i in range(4):
            par = np.zeros(2048, np.int64)
            v = blocks & int(gen[i])
            for b in range(15):
                par ^= (v >> b) & 1
            assert (par == 0).all(), (gen_name, i)


def test_window_shapes_and_tone_steps():
    assert np.asarray(T.Ws).shape == (321,)
    assert np.asarray(T.Ws_synthesis).shape == (211,)
    # demod/LCG jump tables satisfy the recurrences they claim
    A, B = np.asarray(T.demod_prng_A, np.int64), np.asarray(T.demod_prng_B,
                                                            np.int64)
    for k in range(1, 20):
        assert A[k] == (173 * A[k - 1]) % 65536
        assert B[k] == (173 * B[k - 1] + 13849) % 65536
    A, B = np.asarray(T.lcg_A, np.int64), np.asarray(T.lcg_B, np.int64)
    for k in range(1, 20):
        assert A[k] == (171 * A[k - 1]) % 53125
        assert B[k] == (171 * B[k - 1] + 11213) % 53125


def test_per_b0_tables_consistent():
    L = np.asarray(T.imbe_L_by_b0)
    K = np.asarray(T.imbe_K_by_b0)
    assert ((L >= 9) & (L <= 56)).all()
    np.testing.assert_array_equal(
        K, np.where(L < 37, (L + 2) // 3, 12))
    assert np.asarray(T.ambe2450_w0_by_b0).shape == (120,)
    assert np.asarray(T.ambe2400_w0_by_b0).shape == (126,)
