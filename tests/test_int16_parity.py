"""Exact float->int16 parity (mirrors tests/test_floattoshort_parity.c).

Two layers:
  1. Exact parity against the reference's own (pcm float, pcm16) pairs in
     every committed golden vector — the reference C produced both, so
     float_to_short(pcm) must reproduce pcm16 bit-for-bit.
  2. A scalar-oracle property test over LCG-random buffers seeded exactly
     like tests/test_floattoshort_parity.c:37-59, including NaN/Inf and
     clip-boundary samples.
"""

import glob
import os

import numpy as np

from mbe_tpu.ops import synth as synth_ops

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")
MAX_AMP = np.float32(32767.0) * np.float32(0.95)


def scalar_oracle(x):
    """reference_floattoshort (test_floattoshort_parity.c:20-34) in numpy."""
    x = np.asarray(x, np.float32)
    audio = (np.float32(7.0) * x).astype(np.float32)
    audio = np.where(np.isnan(audio), np.float32(0.0), audio)
    audio = np.where(audio > MAX_AMP, MAX_AMP, audio)
    audio = np.where(audio < -MAX_AMP, -MAX_AMP, audio)
    return np.trunc(audio).astype(np.int16)


def test_exact_parity_all_committed_vectors():
    files = sorted(glob.glob(os.path.join(VEC_DIR, "*.npz")))
    checked = 0
    for f in files:
        vec = np.load(f)
        if "pcm16" not in vec.files:
            continue
        got = np.asarray(synth_ops.float_to_short(vec["pcm"]))
        np.testing.assert_array_equal(
            got, vec["pcm16"], err_msg=os.path.basename(f))
        checked += 1
    assert checked >= 10  # all e2e + long vectors carry pcm16


def _fill_test_input(seed, n=160):
    """fill_test_input (test_floattoshort_parity.c:37-59), bit-exact."""
    clip_point = np.float32(MAX_AMP) / np.float32(7.0)
    out = np.empty(n, np.float32)
    state = seed & 0xFFFFFFFF
    for i in range(n):
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        v = np.int32((state >> 8) - 0x007FFFFF)
        out[i] = np.float32(v) / np.float32(65536.0)
    eps = np.float32(1.0 / 32768.0)
    out[0] = 0.0
    out[1] = clip_point
    out[2] = clip_point + eps
    out[3] = clip_point - eps
    out[4] = -clip_point
    out[5] = -clip_point - eps
    out[6] = -clip_point + eps
    out[7] = np.float32(1.0) / np.float32(7.0)
    out[8] = -np.float32(1.0) / np.float32(7.0)
    out[9] = np.nan
    out[10] = np.inf
    out[11] = -np.inf
    return out


def test_scalar_oracle_parity_lcg_buffers():
    for seed in (0x00000001, 0x12345678, 0x00C0FFEE, 0xFFFFFFFF):
        buf = _fill_test_input(seed)
        got = np.asarray(synth_ops.float_to_short(buf[None]))
        want = scalar_oracle(buf)[None]
        np.testing.assert_array_equal(got, want, err_msg=hex(seed))


def test_determinism():
    buf = _fill_test_input(0xDEADBEEF)
    a = np.asarray(synth_ops.float_to_short(buf[None]))
    b = np.asarray(synth_ops.float_to_short(buf[None]))
    np.testing.assert_array_equal(a, b)
