"""ECC kernels vs reference golden vectors — must be bit-exact
(mirrors tests/test_ecc.c of the reference)."""

import jax
import jax.numpy as jnp
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


def test_packed_hard_decoders_match_bitplane():
    """golay2312_hard_packed / hamming1511_hard_packed (the lane-dense hard
    frame path, models/imbe.py + models/ambe.py) agree with the bit-plane
    decoders on random words."""
    rng = np.random.default_rng(11)
    b23 = rng.integers(0, 2, (256, 23)).astype(np.int32)
    w23 = (b23 * (1 << np.arange(23))).sum(axis=1).astype(np.int32)
    out_bits, errs_bits = jax.jit(ecc.golay2312_hard)(b23)
    out_w, errs_w = jax.jit(ecc.golay2312_hard_packed)(w23)
    np.testing.assert_array_equal(np.asarray(errs_bits), np.asarray(errs_w))
    w_from_bits = (np.asarray(out_bits) * (1 << np.arange(23))).sum(axis=1)
    np.testing.assert_array_equal(w_from_bits, np.asarray(out_w))

    b15 = rng.integers(0, 2, (256, 15)).astype(np.int32)
    w15 = (b15 * (1 << np.arange(15))).sum(axis=1).astype(np.int32)
    for v7 in (False, True):
        ob, eb = jax.jit(lambda b, v=v7: ecc.hamming1511_hard(b, v))(b15)
        ow, ew = jax.jit(
            lambda w, v=v7: ecc.hamming1511_hard_packed(w, v))(w15)
        np.testing.assert_array_equal(np.asarray(eb), np.asarray(ew))
        np.testing.assert_array_equal(
            (np.asarray(ob) * (1 << np.arange(15))).sum(axis=1),
            np.asarray(ow))


def test_prng_keywords_match_bit_keystream():
    """prng_keywords packs exactly the reversed keystream slices the
    bit-plane demod XORs in (ambe_common.c:94-99)."""
    from mbe_tpu.ops import demod
    rng = np.random.default_rng(12)
    seed = (16 * rng.integers(0, 4096, 64)).astype(np.int32)
    widths = (23, 23, 23, 15, 15, 15)
    kw = np.asarray(jax.jit(
        lambda s: demod.prng_keywords(s, widths))(seed))  # [rows, C]
    pr = np.asarray(jax.jit(
        lambda s: demod.prng_bits(s, sum(widths)))(seed))  # [bits, C]
    k = 0
    for r, w in enumerate(widths):
        expect = (pr[k:k + w][::-1]
                  * (1 << np.arange(w))[:, None]).sum(axis=0)
        np.testing.assert_array_equal(kw[r], expect)
        k += w


def test_golay_syndrome_mask_matches_reference_table():
    """The algebraic IMLD mask (ops/ecc.golay_mask_from_syndrome) equals
    the reference's precomputed golayMatrix (ecc_const.c) on ALL 2048
    syndromes — Golay(23,12) is perfect, so the weight<=3 coset leader is
    unique and the two formulations must agree bit-for-bit."""
    from mbe_tpu.ops import ecc
    from mbe_tpu.tables import T

    s = jnp.arange(2048, dtype=jnp.int32)
    mask = np.asarray(jax.jit(ecc.golay_mask_from_syndrome)(s))
    np.testing.assert_array_equal(mask, np.asarray(T.golayMatrix, np.int64))
