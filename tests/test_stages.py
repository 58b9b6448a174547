"""Staged API composition: ecc_c0 -> demodulate -> ecc_data must reproduce
the one-call frame decode for every codec (the reference's v2 staged flow,
README.md:180-198)."""

import jax
import numpy as np

from mbe_tpu import api, pipeline
from mbe_tpu.models import ambe, imbe


def test_staged_equals_frame_decode_ambe():
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 2, (8, 4, 24)).astype(np.int32)

    @jax.jit
    def run(fr):
        fr1, c0 = api.ecc_ambe3600x2450_c0(fr)
        fr2 = api.demodulate_ambe3600x2450_data(fr1)
        d, prot = api.ecc_ambe3600x2450_data(fr2)
        d_ref, c0_ref, prot_ref = ambe.decode_ambe3600_frame(fr)
        return d, c0, prot, d_ref, c0_ref, prot_ref

    d, c0, prot, d_ref, c0_ref, prot_ref = jax.tree.map(np.asarray, run(frame))
    # staged API is public channel-major; the internal frame decode is
    # channel-minor (models/state.py round-3 layout)
    np.testing.assert_array_equal(d, d_ref.T)
    np.testing.assert_array_equal(c0, c0_ref)
    np.testing.assert_array_equal(prot, prot_ref)


def test_staged_equals_frame_decode_imbe7200():
    rng = np.random.default_rng(12)
    frame = rng.integers(0, 2, (8, 8, 23)).astype(np.int32)

    @jax.jit
    def run(fr):
        fr1, c0 = api.ecc_imbe7200x4400_c0(fr)
        fr2 = api.demodulate_imbe7200x4400_data(fr1)
        d, prot, c4 = api.ecc_imbe7200x4400_data(fr2)
        d_ref, c0_ref, prot_ref, c4_ref = imbe.decode_imbe7200_frame(fr)
        return d, c0, prot, c4, d_ref, c0_ref, prot_ref, c4_ref

    out = jax.tree.map(np.asarray, run(frame))
    d, c0, prot, c4, d_ref, c0_ref, prot_ref, c4_ref = out
    np.testing.assert_array_equal(d, d_ref.T)
    np.testing.assert_array_equal(c0, c0_ref)
    np.testing.assert_array_equal(prot, prot_ref)
    np.testing.assert_array_equal(c4, c4_ref)


def test_staged_equals_frame_decode_imbe7100():
    rng = np.random.default_rng(13)
    frame = rng.integers(0, 2, (8, 7, 24)).astype(np.int32)

    @jax.jit
    def run(fr):
        fr1, c0 = api.ecc_imbe7100x4400_c0(fr)
        fr2 = api.demodulate_imbe7100x4400_data(fr1)
        d, prot, c4 = api.ecc_imbe7100x4400_data(fr2)
        d = api.convert_imbe7100to7200(d)
        d_ref, c0_ref, prot_ref, c4_ref = imbe.decode_imbe7100_frame(fr)
        return d, c0, prot, c4, d_ref, c0_ref, prot_ref, c4_ref

    out = jax.tree.map(np.asarray, run(frame))
    d, c0, prot, c4, d_ref, c0_ref, prot_ref, c4_ref = out
    np.testing.assert_array_equal(d, d_ref.T)
    np.testing.assert_array_equal(c0, c0_ref)
    np.testing.assert_array_equal(prot, prot_ref)
    np.testing.assert_array_equal(c4, c4_ref)


def test_resolve_total_errors():
    """mbe_result_resolve_total_errors semantics (mbe_result.h:76-99)."""
    res = dict(c0_errors=2, protected_errors=3, c4_errors=0,
               total_errors=0, flags=api.PROCESS_FLAG_C0_VALID)
    assert api.resolve_total_errors(res) == 5
    res["total_errors"] = 5
    assert api.resolve_total_errors(res) == 5
    assert api.resolve_total_errors(None) == 0
    import pytest
    res["total_errors"] = 1  # < component total -> inconsistent
    with pytest.raises(api.MbeInvalidArgument):
        api.resolve_total_errors(res)
    res = dict(c0_errors=200, protected_errors=0, c4_errors=0,
               total_errors=0, flags=0)
    with pytest.raises(api.MbeInvalidArgument):
        api.resolve_total_errors(res)


def test_convert_7100_k_variants():
    """convert_imbe7100to7200's one-hot perm matmuls vs a plain numpy
    gather through perm[K], over every reachable K variant plus the
    b0>207 clip edge (imbe7100x4400.c:380-437)."""
    from mbe_tpu.models.imbe import _conv7100_tables
    from mbe_tpu.tables import T

    perms = np.asarray(_conv7100_tables())
    # one b0 per distinct K in the table, plus a clipped b0
    b0_by_k = {}
    for b0 in range(208):
        b0_by_k.setdefault(int(T.imbe_K_by_b0[b0]), b0)
    b0_list = sorted(b0_by_k.values()) + [255]

    rng = np.random.default_rng(99)
    d = rng.integers(0, 2, (len(b0_list), 88)).astype(np.int32)
    for row, b0 in enumerate(b0_list):
        bits = [(b0 >> s) & 1 for s in range(7, -1, -1)]
        d[row, [1, 2, 3, 4, 5, 6]] = bits[:6]
        d[row, [86, 87]] = bits[6:]

    out = np.asarray(jax.jit(api.convert_imbe7100to7200)(d))
    K = T.imbe_K_by_b0[np.minimum(np.array(b0_list), 207)]
    expect = np.stack([d[i, perms[np.clip(K[i], 1, 12)]]
                       for i in range(len(b0_list))])
    np.testing.assert_array_equal(out, expect)


def test_vuv_sparse_select_covers_all_runtime_jl():
    """_vuv_band_js enumerates per-band candidate jl values in host numpy;
    a drifted re-derivation would make _vuv_select silently return 0 for
    uncovered jl (ADVICE r3). Pin (a) every runtime-reachable jl value is a
    candidate, and (b) _vuv_select == the dense 8-way where-sum for every
    reachable (f0, vrow) combination."""
    import jax.numpy as jnp
    from mbe_tpu.tables import T as TT

    for plus in (False, True):
        # every f0 the runtime can produce, computed exactly as the decoder
        # does (f32 multiply order, trunc, clip)
        if plus:  # 2400: f0 = lut over clip(b0, 0, 125) (ambe.py:423-424)
            f0s = np.asarray(TT.ambe2400_f0_by_b0, np.float32)
        else:     # 2450: voice table over clip(b0, 0, 119) + silence f0
            f0s = np.concatenate([
                np.asarray(TT.AmbeW0table, np.float32),
                np.asarray([TT.ambe2450_silence_f0_w0[0]], np.float32)])
        cands = ambe._vuv_band_js(plus)
        lf = np.arange(57, dtype=np.float32)[:, None]
        jl = np.clip((lf * np.float32(16.0) * f0s[None, :]).astype(np.int32),
                     0, 7)  # [57, F]
        for l in range(57):
            assert set(jl[l].tolist()) <= set(cands[l]), (plus, l)

        # dense-vs-sparse equivalence on the full reachable jl grid
        rng = np.random.default_rng(7 if plus else 8)
        vrow = rng.standard_normal((8, f0s.size)).astype(np.float32)
        got = np.asarray(jax.jit(
            lambda v, j: ambe._vuv_select(v, j, plus=plus)
        )(jnp.asarray(vrow), jnp.asarray(jl)))
        dense = np.zeros((57, f0s.size), np.float32)
        for t in range(8):
            dense = np.where(jl == t, vrow[t][None, :], dense)
        np.testing.assert_array_equal(got, dense.astype(np.int32))


def test_imbe_scatter_packed_equals_pairs(monkeypatch):
    """The packed-word variable-shift scatter and the sparse (col, bit)
    compare-reduce are two formulations of the same bb[58][12] bit layout
    (imbe7200x4400.c:156-168), switched at trace time by
    MBE_TPU_IMBE_SCATTER. They must agree BITWISE on every L variant so
    the fast path can never silently drift from the reference layout."""
    from mbe_tpu.models import state
    from mbe_tpu.models.imbe import _B0_IDX, decode_imbe4400_parms

    rng = np.random.default_rng(21)
    C = 256  # one lane per b0 value: covers all 48 variants + bad lanes
    d = rng.integers(0, 2, (88, C)).astype(np.int32)
    b0 = np.arange(C, dtype=np.int64)
    for k in range(len(_B0_IDX)):
        d[_B0_IDX[k], :] = (b0 >> (len(_B0_IDX) - 1 - k)) & 1
    st = state.init_state(C)
    dj = jax.numpy.asarray(d)

    outs = {}
    for mode in ("pairs", "packed", "batched"):
        monkeypatch.setenv("MBE_TPU_IMBE_SCATTER", mode)
        outs[mode] = jax.tree.map(
            np.asarray,
            jax.jit(decode_imbe4400_parms)(dj, st.cur, st.prev))
    jax.tree.map(np.testing.assert_array_equal, outs["pairs"],
                 outs["packed"])
    jax.tree.map(np.testing.assert_array_equal, outs["pairs"],
                 outs["batched"])


def test_imbe_midct_matmul_equals_where(monkeypatch):
    """The block-IDCT Mlo/Mhi row gather has two trace-selectable forms
    (MBE_TPU_IMBE_MIDCT): one-hot MXU matmuls (default) and the round-3
    where-chain. The matmul form is exact by construction (one 1.0 per
    one-hot column, 0*x products, x + 0 == x), so the whole decode must
    agree BITWISE across every L variant."""
    from mbe_tpu.models import state
    from mbe_tpu.models.imbe import _B0_IDX, decode_imbe4400_parms

    rng = np.random.default_rng(23)
    C = 256  # one lane per b0 value: covers all 48 variants + bad lanes
    d = rng.integers(0, 2, (88, C)).astype(np.int32)
    b0 = np.arange(C, dtype=np.int64)
    for k in range(len(_B0_IDX)):
        d[_B0_IDX[k], :] = (b0 >> (len(_B0_IDX) - 1 - k)) & 1
    st = state.init_state(C)
    dj = jax.numpy.asarray(d)

    outs = {}
    for mode in ("matmul", "where"):
        monkeypatch.setenv("MBE_TPU_IMBE_MIDCT", mode)
        outs[mode] = jax.tree.map(
            np.asarray,
            jax.jit(decode_imbe4400_parms)(dj, st.cur, st.prev))
    jax.tree.map(np.testing.assert_array_equal, outs["matmul"],
                 outs["where"])


def test_ambe_tl_gather_close_to_dense(monkeypatch):
    """The AMBE per-block IDCT has two trace-selectable forms
    (MBE_TPU_AMBE_TL): gather-by-size with explicit ascending-k
    accumulation (default, matches the reference's f32 summation order)
    and the all-sizes U einsum. They differ only in f32 summation order
    inside the 6-term k-contraction (measured <=5e-5 max rel; the gather
    form is the one CLOSER to the C loop), so any larger divergence means
    a slot/size mapping bug."""
    rng = np.random.default_rng(29)
    C = 64
    L = np.concatenate([np.arange(57), rng.integers(0, 57, C - 57)]
                       ).astype(np.int32)  # every block-size row
    Gm = rng.normal(size=(8, C)).astype(np.float32)
    Gm[0] = 0
    b5 = rng.integers(0, 32, C).astype(np.int32)
    b6 = rng.integers(0, 16, C).astype(np.int32)
    b7 = rng.integers(0, 16, C).astype(np.int32)
    b8 = rng.integers(0, 8, C).astype(np.int32)

    for plus in (False, True):
        outs = {}
        for mode in ("gather", "dense"):
            monkeypatch.setenv("MBE_TPU_AMBE_TL", mode)
            outs[mode] = np.asarray(jax.jit(
                lambda *x: ambe._tl_from_codes(*x, plus=plus))(
                    L, Gm, b5, b6, b7, b8))
        np.testing.assert_allclose(outs["gather"], outs["dense"],
                                   rtol=1e-3, atol=1e-3)
