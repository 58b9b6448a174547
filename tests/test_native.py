"""Native host shim vs numpy fallback parity."""

import numpy as np

from mbe_tpu import native


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (16, 96)).astype(np.int32)
    packed = native.pack_bits(bits)
    assert packed.shape == (16, 12)
    back = native.unpack_bits(packed, 96)
    np.testing.assert_array_equal(back, bits)


def test_unpack_matches_numpy():
    rng = np.random.default_rng(1)
    packed = rng.integers(0, 256, (8, 23)).astype(np.uint8)
    got = native.unpack_bits(packed, 184)
    want = np.unpackbits(packed, axis=1)[:, :184].astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_interleave():
    rng = np.random.default_rng(2)
    pcm = rng.integers(-1000, 1000, (4, 160)).astype(np.int16)
    got = native.interleave_pcm(pcm)
    np.testing.assert_array_equal(got, pcm.T)


def test_scatter():
    bits = np.arange(12, dtype=np.int32)[None] % 2
    idx = np.array([0, 5, -1, 11], np.int32)
    out = native.scatter_bits(bits, idx, 4)
    np.testing.assert_array_equal(out[0], [bits[0, 0], bits[0, 5], 0,
                                           bits[0, 11]])


def test_scatter_out_of_range_high():
    # indices >= n_in must zero-fill, matching mbe_host_scatter_bits
    bits = np.ones((2, 12), np.int32)
    idx = np.array([0, 12, 13, 100, 11, -3], np.int32)
    out = native.scatter_bits(bits, idx, 6)
    np.testing.assert_array_equal(out, np.tile([1, 0, 0, 0, 1, 0], (2, 1)))
