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
    np.testing.assert_array_equal(d, d_ref)
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
    np.testing.assert_array_equal(d, d_ref)
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
    np.testing.assert_array_equal(d, d_ref)
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
