"""Pallas kernels (interpret mode) match their XLA reference forms."""

import jax
import jax.numpy as jnp
import numpy as np


def test_voiced_kernel_matches_closed_form():
    """The Chebyshev-recurrence kernel (interpret mode) matches the
    closed-form cos grids to recurrence-drift tolerance. The three-term
    recurrence's response to a step-k rounding error is sin((n-k)s)/sin(s),
    so worst-case drift over 160 samples is ~160*eps/sin(s) — order 1e-4
    relative at the smallest phase steps, i.e. >=80 dB, versus the 60 dB
    synthesis budget (the reference's own oscillator recurrence,
    mbelib.c:208-223, carries the same error class)."""
    from mbe_tpu.ops.pallas import voiced as pv

    rng = np.random.default_rng(7)
    c = 128
    g1 = rng.uniform(0, 5, (c, 56)).astype(np.float32)
    p1 = rng.uniform(0, 6, (c, 56)).astype(np.float32)
    s1 = rng.uniform(0, 3, (c, 56)).astype(np.float32)
    g2 = rng.uniform(0, 5, (c, 56)).astype(np.float32)
    p2 = rng.uniform(0, 6, (c, 56)).astype(np.float32)
    s2 = rng.uniform(0, 3, (c, 56)).astype(np.float32)
    a0 = rng.uniform(0, 4, (c, 7)).astype(np.float32)
    da = rng.uniform(-0.02, 0.02, (c, 7)).astype(np.float32)
    ip = rng.uniform(0, 6, (c, 7)).astype(np.float32)
    al = rng.uniform(0, 2, (c, 7)).astype(np.float32)
    q = rng.uniform(-2e-3, 2e-3, (c, 7)).astype(np.float32)
    wp = rng.uniform(0, 1, 160).astype(np.float32)
    wc = rng.uniform(0, 1, 160).astype(np.float32)
    out = pv.voiced_sums(
        *(jnp.asarray(x.T) for x in (g1, p1, s1, g2, p2, s2, a0, da, ip, al,
                                     q)),  # kernel-native [56|7, C]
        jnp.asarray(wp), jnp.asarray(wc),
        interpret=True)
    n = np.arange(160)[None, None, :]
    ref_p = np.sum(g1[:, :, None] * np.cos(p1[:, :, None] + s1[:, :, None] * n),
                   axis=1)
    ref_c = np.sum(g2[:, :, None] * np.cos(p2[:, :, None] + s2[:, :, None] * n),
                   axis=1)
    # quadratic-phase interpolated component: amp lerp * cos(theta_n)
    ref_i = np.sum((a0[:, :, None] + da[:, :, None] * n)
                   * np.cos(ip[:, :, None] + al[:, :, None] * n
                            + q[:, :, None] * n * n), axis=1)
    ref = wp[None, :] * ref_p + wc[None, :] * ref_c + ref_i  # [C, 160]
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(out).T - ref).max() / scale < 2e-4


def test_soft_ecc_kernel_matches_xla():
    """The fused soft-ECC kernel (interpret mode) reproduces the XLA soft
    decoders bit-exactly, including pure tie-break inputs (zero/constant
    reliabilities) where the reference's lexicographic order
    (ecc.c:54-67) is the only thing deciding the winner."""
    from mbe_tpu.ops import ecc
    from mbe_tpu.ops.pallas import softecc
    from mbe_tpu.tables import T

    # index-systematic precondition for the kernel's matches-hard
    # iota-compare: codeword index == packed data word, for all 3 codebooks
    np.testing.assert_array_equal(
        (T.golay_codewords[:, 11:].astype(np.int64)
         << np.arange(12)).sum(axis=1), np.arange(4096))
    for v7 in (False, True):
        cb = T.hamming_codewords_7100 if v7 else T.hamming_codewords_std
        pos = (ecc._HAM_DATA_POS_7100 if v7 else ecc._HAM_DATA_POS_STD)
        w = np.zeros(15, np.int64)
        w[pos] = 1 << np.arange(11)
        np.testing.assert_array_equal(
            (cb.astype(np.int64) * w).sum(axis=1), np.arange(2048))

    rng = np.random.default_rng(42)
    c = 256
    bits = rng.integers(0, 2, (c, 23)).astype(np.int32)
    cases = [rng.integers(0, 256, (c, 23)).astype(np.int32),
             np.full((c, 23), 7, np.int32),
             np.zeros((c, 23), np.int32)]
    for rel in cases:
        out_ref, diffs_ref = jax.jit(ecc.golay2312_soft)(bits, rel)
        hard, _ = ecc.golay2312_hard(bits)
        idxh = jnp.asarray(
            (np.asarray(hard)[:, 11:] << np.arange(12)).sum(axis=1),
            dtype=jnp.int32)
        key = np.asarray(softecc.golay2312_soft_keys(
            jnp.asarray(bits), jnp.asarray(rel), idxh,
            T.golay_codewords, interpret=True))
        best, bd = key & 0xFFF, (key >> 12) & 0xF
        cw = T.golay_codewords.astype(np.int32)
        out = np.concatenate([bits[:, :11], cw[best][:, 11:]], axis=1)
        np.testing.assert_array_equal(np.asarray(out_ref), out)
        np.testing.assert_array_equal(np.asarray(diffs_ref), bd)

    hb = rng.integers(0, 2, (c, 15)).astype(np.int32)
    hr = rng.integers(0, 256, (c, 15)).astype(np.int32)
    for v7 in (False, True):
        cb = T.hamming_codewords_7100 if v7 else T.hamming_codewords_std
        out_ref, diffs_ref = jax.jit(
            lambda b, r, v=v7: ecc.hamming1511_soft(b, r, v))(hb, hr)
        hard, _ = ecc.hamming1511_hard(hb, v7)
        pos = (ecc._HAM_DATA_POS_7100 if v7 else ecc._HAM_DATA_POS_STD)
        w = np.zeros(15, np.int64)
        w[pos] = 1 << np.arange(11)
        idxh = jnp.asarray((np.asarray(hard) * w).sum(axis=1),
                           dtype=jnp.int32)
        key = np.asarray(softecc.hamming1511_soft_keys(
            jnp.asarray(hb), jnp.asarray(hr), idxh, cb, v7, interpret=True))
        best, bd = key & 0x7FF, (key >> 11) & 0xF
        np.testing.assert_array_equal(np.asarray(out_ref),
                                      cb.astype(np.int32)[best])
        np.testing.assert_array_equal(np.asarray(diffs_ref), bd)


def test_render_voiced_pallas_wiring_matches_xla(monkeypatch):
    """The full render_voiced Pallas branch (gain masking, start-phase
    shift, interp amp/alpha/q coefficient wiring) matches the XLA path in
    interpret mode — guards the wiring, not just the kernel (the kernel
    alone is covered above). Includes lanes where the interpolation
    eligibility (l<8, both voiced, |dw0| < 0.1*w0) is active."""
    from mbe_tpu.ops import synth

    rng = np.random.default_rng(11)
    c = 128
    cw0 = jnp.asarray((0.05 + rng.random(c) * 0.25).astype(np.float32))
    # half the lanes pitch-stable (interp-eligible), half not
    jitter = np.where(rng.random(c) < 0.5, 1.01, 1.5).astype(np.float32)
    pw0 = cw0 * jnp.asarray(jitter)
    cMl = jnp.asarray(rng.random((57, c)).astype(np.float32) * 2)
    pMl = jnp.asarray(rng.random((57, c)).astype(np.float32) * 2)
    cVl = jnp.asarray((rng.random((57, c)) < 0.7).astype(np.int32))
    pVl = jnp.asarray((rng.random((57, c)) < 0.7).astype(np.int32))
    cPhi = jnp.asarray((rng.random((57, c)) * 6.28).astype(np.float32))
    pPhi = jnp.asarray((rng.random((57, c)) * 6.28).astype(np.float32))
    maxl = jnp.asarray(rng.integers(9, 57, c, dtype=np.int32))
    args = (cw0, cMl, cVl, cPhi, pw0, pMl, pVl, pPhi, maxl)

    monkeypatch.setenv("MBE_TPU_PALLAS_VOICED", "0")
    ref = np.asarray(synth.render_voiced(*args))
    monkeypatch.setenv("MBE_TPU_PALLAS_VOICED", "1")
    out = np.asarray(synth.render_voiced(*args))

    scale = np.abs(ref).max()
    # 5e-4 relative = 66 dB: recurrence drift + the amp-lerp reassociation
    # (a0 + n*da vs a0 + (n/160)*diff), both well inside the 60 dB budget
    assert np.abs(out - ref).max() / scale < 5e-4


def test_unvoiced_pallas_wiring_matches_xla(monkeypatch):
    """The opt-in fused unvoiced kernel (interpret mode) matches the XLA
    stage (window -> DFT -> band scalors -> iDFT -> WOLA,
    mbe_unvoiced_fft.c:714-761) to bf16-hi/lo DFT tolerance (~90 dB;
    the synthesis budget is 60 dB). Guards the full wiring: glm gating,
    band map, segment sums, WOLA weights."""
    from mbe_tpu.ops import synth

    rng = np.random.default_rng(5)
    c = 128
    L = rng.integers(9, 57, c).astype(np.int32)
    w0 = (2.0 * np.pi * 0.4875 / (L + 0.25)).astype(np.float32)
    args = (jnp.asarray(w0), jnp.asarray(L),
            jnp.asarray(rng.uniform(0, 500, (57, c)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 2, (57, c)).astype(np.int32)),
            # previousUw carries only the WOLA-read upper half (round-4
            # state diet): [128, C]
            jnp.asarray(rng.uniform(-400, 400, (128, c)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 53125, (256, c)).astype(np.float32)))

    monkeypatch.setenv("MBE_TPU_PALLAS_UNVOICED", "0")
    add_ref, uw_ref = (np.asarray(x) for x in synth.unvoiced_fft(*args))
    monkeypatch.setenv("MBE_TPU_PALLAS_UNVOICED", "1")
    add, uw = (np.asarray(x) for x in synth.unvoiced_fft(*args))

    scale = max(np.abs(add_ref).max(), np.abs(uw_ref).max())
    assert np.abs(add - add_ref).max() / scale < 1e-4
    assert np.abs(uw - uw_ref).max() / scale < 1e-4


def test_render_tone_angle_addition_matches_grid():
    """render_tone's angle-addition factorization (10 uint32-exact anchor
    phases x 16 small offsets) matches the naive per-sample wrapped-phase
    evaluation (mbelib.c:707-736) for single + dual tones across random
    states; the uint32 phase-accumulator states must be bit-identical."""
    from mbe_tpu.ops import synth
    from mbe_tpu.tables import T

    synth._lazy_tables()
    rng = np.random.default_rng(3)
    c = 128
    # mix of valid single tones (5..122), dual (128..163), invalid ids
    tid = rng.choice(
        np.r_[np.arange(5, 123), np.arange(128, 164), [0, 1, 255]],
        size=c).astype(np.int32)
    ad = rng.integers(0, 128, c, dtype=np.int32)
    swn = rng.integers(0, 2**31, c, dtype=np.int64).astype(np.uint32)
    tp = rng.integers(0, 2**31, c, dtype=np.int64).astype(np.uint32)

    s_out, swn_out, tp_out = synth.render_tone(
        jnp.asarray(tid), jnp.asarray(ad), jnp.asarray(swn), jnp.asarray(tp))

    # numpy oracle: naive wrapped-phase grids
    steps = np.asarray(synth._TONE_STEPS)
    freqs = np.asarray(T.tone_freqs)
    valid = np.asarray(T.tone_valid)[tid] != 0
    f1, f2 = freqs[tid, 0], freqs[tid, 1]
    st1, st2 = steps[tid, 0], steps[tid, 1]
    active = valid & (f1 > 0)
    dual = (f2 > 0) & (np.abs(f2 - f1) > 1e-6)
    st2 = np.where(dual, st2, 0).astype(np.uint32)
    gain = (np.maximum(ad, 0) / np.float32(127.0)) * np.float32(
        (32767.0 * 0.95) / 7.0)
    nn = np.arange(1, 161, dtype=np.uint32)[None, :]
    rad = np.float32(2 * np.pi / 2**32)
    ph1 = swn[:, None] + st1[:, None] * nn
    ph2 = tp[:, None] + st2[:, None] * nn
    s1 = np.sin(ph1.astype(np.float32) * rad - np.float32(np.pi / 2))
    s2 = np.sin(ph2.astype(np.float32) * rad - np.float32(np.pi / 2))
    ref = np.where(dual[:, None],
                   0.5 * gain[:, None] * (s1 + s2), gain[:, None] * s1)
    ref = np.where(active[:, None], ref, 0.0)

    np.testing.assert_array_equal(
        np.asarray(swn_out), np.where(active, swn + st1 * np.uint32(160), swn))
    np.testing.assert_array_equal(
        np.asarray(tp_out),
        np.where(active & dual, tp + st2 * np.uint32(160), tp))
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(np.asarray(s_out).T - ref).max() / scale < 5e-4
