#!/usr/bin/env python3
"""Frame ENCODERS: parameter bits -> valid over-the-air frames.

Inverse of the reference's decode path (Golay/Hamming encode + PRNG
scrambling + bit-plane packing), used to craft full frames that walk the
tone/silence/erasure FSM paths through mbe_process*Framef — the reference
ships no encoder, so golden generation needs this. Pure numpy, host-side.

Bit conventions match the decoders exactly:
  AMBE 3600 (ambe_common.c:22-157): C0 Golay over fr[0][1..23] with the
  Golay24 even-parity bit at fr[0][0]; C1 Golay scrambled by the 16*C0-data
  seeded PRNG; C2/C3 raw.
  IMBE 7200 (imbe7200x4400.c:424-707): C0 Golay over fr[0][0..22], rows 1-3
  Golay + rows 4-6 Hamming(15,11) scrambled by the 114-step PRNG, row 7 raw.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mbe_tpu.tables import T  # noqa: E402


def _golay_cw(data12: int) -> np.ndarray:
    """23-bit Golay codeword (LSB-first, parity 0..10, data 11..22)."""
    return np.asarray(T.golay_codewords)[data12].astype(np.int32)


def _hamming_lut():
    """data11 (bits at positions 4..14, LSB at 4) -> 15-bit codeword row."""
    cw = np.asarray(T.hamming_codewords_std).astype(np.int32)
    keys = (cw[:, 4:] * (1 << np.arange(11))).sum(axis=1)
    lut = np.zeros(2048, np.int32)
    lut[keys] = np.arange(2048)
    assert len(set(keys.tolist())) == 2048
    return cw, lut


def _prng(seed: int, count: int) -> np.ndarray:
    """pr[1..count] >> 15 (ambe_common.c:86-92)."""
    out = np.zeros(count, np.int32)
    p = seed & 0xFFFF
    for k in range(count):
        p = (173 * p + 13849) & 0xFFFF
        out[k] = p >> 15
    return out


def encode_ambe3600(d: np.ndarray) -> np.ndarray:
    """49 parameter bits -> clean [4, 24] AMBE 3600x24xx frame."""
    d = np.asarray(d, np.int32)
    assert d.shape == (49,)
    fr = np.zeros((4, 24), np.int32)

    # C0: d[i] = g[22-i] for i=0..11  ->  data bit k = d[11-k]
    data0 = sum(int(d[11 - k]) << k for k in range(12))
    g0 = _golay_cw(data0)
    fr[0, 1:24] = g0
    fr[0, 0] = int(g0.sum()) & 1  # Golay24 even parity (ambe_common.c:33-44)

    # keystream seeded by 16 * C0 data word (ambe_common.c:75-100)
    key = _prng(16 * data0, 23)

    # C1: d[12+i] = g1[22-i]; frame holds cw ^ key (decode XORs it off)
    data1 = sum(int(d[23 - k]) << k for k in range(12))
    g1 = _golay_cw(data1)
    fr[1, :23] = g1 ^ key[::-1]

    # C2: d[24+i] = fr[2][10-i]; C3: d[35+i] = fr[3][13-i]
    fr[2, :11] = d[24:35][::-1]
    fr[3, :14] = d[35:49][::-1]
    return fr


def encode_imbe7200(d: np.ndarray) -> np.ndarray:
    """88 parameter bits -> clean [8, 23] IMBE 7200x4400 frame."""
    d = np.asarray(d, np.int32)
    assert d.shape == (88,)
    ham_cw, ham_lut = _hamming_lut()
    fr = np.zeros((8, 23), np.int32)

    # C0: d[i] = c0[22-i], i=0..11
    data0 = sum(int(d[11 - k]) << k for k in range(12))
    fr[0, :23] = _golay_cw(data0)

    key = _prng(16 * data0, 114)

    # rows 1..3: Golay codewords of d[12i..12i+11], scrambled
    k = 0
    for i in range(1, 4):
        base = 12 * i
        data = sum(int(d[base + 11 - t]) << t for t in range(12))
        fr[i, :23] = _golay_cw(data) ^ key[k:k + 23][::-1]
        k += 23
    # rows 4..6: Hamming codewords of d[48+11m..+10] at positions 14..4
    for m, i in enumerate(range(4, 7)):
        base = 48 + 11 * m
        data_key = sum(int(d[base + 14 - p]) << (p - 4) for p in range(4, 15))
        cw = ham_cw[ham_lut[data_key]]
        fr[i, :15] = cw ^ key[k:k + 15][::-1]
        k += 15
    # row 7: d[81+i] = fr[7][6-i]
    fr[7, :7] = d[81:88][::-1]
    return fr


def _hamming7100_lut():
    """data11 (bits at positions 4..14, LSB at 4) -> 15-bit codeword row
    for the 7100 Hamming variant (imbe7100x4400hammingGenerator)."""
    cw = np.asarray(T.hamming_codewords_7100).astype(np.int32)
    keys = (cw[:, 4:] * (1 << np.arange(11))).sum(axis=1)
    lut = np.zeros(2048, np.int32)
    lut[keys] = np.arange(2048)
    assert len(set(keys.tolist())) == 2048
    return cw, lut


def _conv7100_perm(K: int) -> np.ndarray:
    """mbe_convertImbe7100to7200 (imbe7100x4400.c:405-430) as a gather:
    d7200[j] = d7100[perm[j]]."""
    dst = np.zeros(88, np.int32)
    dst[87] = 0
    dst[48 + K] = 42
    dst[49 + K] = 43
    k = 44
    j = 48
    for _ in range(K):
        dst[j] = k
        j += 1
        k += 1
    j = 0
    k = 1
    while j < 87:
        dst[j] = k
        j += 1
        if j == 48:
            j += K + 2
        k += 1
        if k == 42:
            k += K + 2
    return dst


def encode_imbe7100(d: np.ndarray) -> np.ndarray:
    """88 parameter bits (7200x4400 layout) -> clean [7, 24] IMBE
    7100x4400 frame.

    Inverts mbe_decodeImbe7100x4400Frame (imbe7100x4400.c:439-496): the
    7200->7100 layout permutation (K from b0, which sits at the same bit
    positions in both layouts), short-Golay C0 (18 bits at fr[0][1..18],
    7 data bits), Golay C1..C3 / 7100-variant Hamming C4..C5 under the
    100-step PRNG keystream seeded by fr[0] bits 18..7, raw C6."""
    d = np.asarray(d, np.int32)
    assert d.shape == (88,)

    # K from b0 (imbe7100x4400.c:392-403); b0 bit positions {0..5,85,86}
    # in 7200 layout == {1..6,86,87} in 7100 layout under every K-perm.
    b0 = sum(int(d[i]) << (7 - n)
             for n, i in enumerate([0, 1, 2, 3, 4, 5, 85, 86]))
    w0 = 4.0 * np.pi / (b0 + 39.5)
    L = int(0.9254 * int(np.pi / w0 + 0.25))
    K = (L + 2) // 3 if L < 37 else 12

    dd = np.zeros(88, np.int32)
    dd[_conv7100_perm(K)] = d  # 7100-layout parameter bits

    # 7100 d-vector layout (imbe7100x4400.c:153-211):
    # C0 7 bits | C1 12 | C2 12 | C3 12 | C4 11 | C5 11 | C6 23
    fr = np.zeros((7, 24), np.int32)

    # C0: short Golay, d[0..6] = cw[17..11], cw[18..22] = 0 pad,
    # stored at fr[0][1..18]
    data0 = sum(int(dd[6 - t]) << t for t in range(7))
    cw0 = _golay_cw(data0)
    assert not cw0[18:].any()
    fr[0, 1:19] = cw0[:18]

    # keystream: seed = fr[0] bits 18..12 (== the 7-bit C0 data word),
    # pr[0] = 16*seed (imbe7100x4400.c:302-311); pr[1..100] cover
    # C1(24) C2(23) C3(23) C4(15) C5(15)
    key = _prng(16 * data0, 100)

    # C1: d[7..18] = cw[22..11], codeword at fr[1][1..23]; the keystream
    # covers all 24 columns (j=23..0 <- pr[1..24]), so fr[1][0] encodes
    # the key bit and demodulates back to 0.
    data1 = sum(int(dd[18 - t]) << t for t in range(12))
    fr[1, 1:24] = _golay_cw(data1)
    fr[1, :] ^= key[0:24][::-1]

    # C2, C3: codewords at fr[i][0..22], keystream j=22..0
    k = 24
    for i, base in ((2, 19), (3, 31)):
        data = sum(int(dd[base + 11 - t]) << t for t in range(12))
        fr[i, :23] = _golay_cw(data) ^ key[k:k + 23][::-1]
        k += 23

    # C4, C5: 7100-variant Hamming, d[...] = cw[14..4], cw at fr[i][0..14]
    ham_cw, ham_lut = _hamming7100_lut()
    for i, base in ((4, 43), (5, 54)):
        data_key = sum(int(dd[base + 14 - p]) << (p - 4) for p in range(4, 15))
        fr[i, :15] = ham_cw[ham_lut[data_key]] ^ key[k:k + 15][::-1]
        k += 15
    assert k == 100

    # C6: d[65+t] = fr[6][22-t]
    fr[6, :23] = dd[65:88][::-1]
    return fr


def flip_bits(fr: np.ndarray, positions) -> np.ndarray:
    """Inject channel errors: flip (row, col) positions."""
    out = fr.copy()
    for r, c in positions:
        out[r, c] ^= 1
    return out


if __name__ == "__main__":
    # self-test: encode random parameter bits, decode with the reference,
    # expect exact d recovery and zero errors
    sys.path.insert(0, os.path.dirname(__file__))
    from ref import Ref

    r = Ref()
    rng = np.random.default_rng(0)
    for _ in range(50):
        d = rng.integers(0, 2, 49).astype(np.int32)
        fr = encode_ambe3600(d)
        dd, ret, res = r.decode_frame("ambe2450", fr)
        assert ret == 0 and res["total"] == 0, (ret, res)
        assert np.array_equal(dd[:49], d), "ambe d mismatch"
    for _ in range(50):
        d = rng.integers(0, 2, 88).astype(np.int32)
        fr = encode_imbe7200(d)
        dd, ret, res = r.decode_frame("imbe7200", fr)
        assert ret == 0 and res["total"] == 0, (ret, res)
        assert np.array_equal(dd[:88], d), "imbe d mismatch"
    for _ in range(50):
        d = rng.integers(0, 2, 88).astype(np.int32)
        fr = encode_imbe7100(d)
        dd, ret, res = r.decode_frame("imbe7100", fr)
        assert ret == 0 and res["total"] == 0, (ret, res)
        assert np.array_equal(dd[:88], d), "imbe7100 d mismatch"
    # error injection corrects within Golay/Hamming capability
    d = rng.integers(0, 2, 49).astype(np.int32)
    fr = flip_bits(encode_ambe3600(d), [(1, 5), (1, 9), (2, 3)])
    dd, ret, res = r.decode_frame("ambe2450", fr)
    assert np.array_equal(dd[24:35], np.where(
        np.arange(11) == 10 - 3, 1 - d[24:35], d[24:35])), "C2 raw flip"
    print("encode_frames self-test OK")
