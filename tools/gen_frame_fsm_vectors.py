#!/usr/bin/env python3
"""FRAME-level FSM golden vectors: crafted parameter bits encoded back into
full over-the-air frames (tools/encode_frames.py) with controlled bit-error
injection, processed by the reference's mbe_process*Framef. Unlike
fsm_*.npz (Dataf level), these walk tone/silence/erasure/repeat through the
REAL C0 ECC + PRNG demod + tone-classify pipeline."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from encode_frames import (encode_ambe3600, encode_imbe7100,  # noqa: E402
                           encode_imbe7200, flip_bits)
from gen_fsm_vectors import ambe2400_d, ambe2450_d, imbe_d  # noqa: E402
from ref import Ref  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")

# bit positions inside DATA regions (parity-bit flips are corrected but not
# counted — data flips are what drive the error totals).
# AMBE fr[0][1..23] holds the C0 codeword (data at cw idx 11..22 ->
# columns 12..23); fr[1][0..22] the C1 codeword (data at columns 11..22).
C0_DATA = [(0, 13), (0, 18), (0, 23)]        # 3 C0 data errors
C1_DATA = [(1, 12), (1, 16), (1, 21)]        # 3 C1 data errors
# IMBE row0 codeword at columns 0..22 (data 11..22); rows 1-3 likewise;
# rows 4-6 Hamming (any single flip counts 1).
I_C0 = [(0, 13), (0, 18)]
I_GOLAY = [(1, 12), (1, 16), (1, 21), (2, 13), (2, 17), (2, 22),
           (3, 11), (3, 15), (3, 19)]
I_HAM = [(4, 2), (5, 8), (6, 13)]


def tone2450(tone_id, ad=40):
    d = ambe2450_d(tone_id=tone_id)
    for i, s in zip(range(6, 12), range(5, -1, -1)):
        d[i] = (ad >> s) & 1  # nonzero amplitude
    return d


def sequences():
    rng = np.random.default_rng(777)
    seqs = {}

    # AMBE+2 2450
    s = []
    for _ in range(3):
        s.append((encode_ambe3600(ambe2450_d(b0=40, rng=rng)), []))
    for _ in range(2):
        s.append((encode_ambe3600(tone2450(20)), []))           # clean tone
    s.append((encode_ambe3600(tone2450(20)),
              C0_DATA + C1_DATA))                               # BER>=6 gate
    s.append((encode_ambe3600(ambe2450_d(b0=124)), []))         # silence W124
    s.append((encode_ambe3600(ambe2450_d(b0=125)), []))         # silence W125
    for _ in range(2):
        s.append((encode_ambe3600(ambe2450_d(b0=121, rng=rng)), []))  # erasure
    for _ in range(6):                                          # repeats->mute
        s.append((encode_ambe3600(ambe2450_d(b0=50, rng=rng)),
                  C0_DATA + C1_DATA))
    s.append((encode_ambe3600(tone2450(20)), []))               # tone again
    for _ in range(3):
        s.append((encode_ambe3600(ambe2450_d(b0=60, rng=rng)), []))
    seqs["ambe2450"] = s

    # AMBE 2400 (D-STAR)
    s = []
    for _ in range(3):
        s.append((encode_ambe3600(ambe2400_d(b0=40, rng=rng)), []))
    for _ in range(2):
        s.append((encode_ambe3600(ambe2400_d(tone_id=60)), []))  # clean tone
    s.append((encode_ambe3600(ambe2400_d(tone_id=60)),
              C0_DATA[:2] + C1_DATA[:2]))                       # noisy tone
    s.append((encode_ambe3600(ambe2400_d(tone_id=200)), []))    # invalid tone
    for _ in range(6):                                          # total>3
        s.append((encode_ambe3600(ambe2400_d(b0=50, rng=rng)),
                  C0_DATA[:1] + C1_DATA))
    for _ in range(4):
        s.append((encode_ambe3600(ambe2400_d(b0=70, rng=rng)), []))
    seqs["ambe2400"] = s

    # IMBE 7200
    s = []
    for _ in range(3):
        s.append((encode_imbe7200(imbe_d(b0=100, rng=rng)), []))
    for _ in range(7):                                          # headroom reset
        s.append((encode_imbe7200(imbe_d(b0=220, rng=rng)), []))
    for _ in range(45):                                         # error-rate mute
        s.append((encode_imbe7200(imbe_d(b0=110, rng=rng)),
                  I_C0 + I_GOLAY + I_HAM))
    for _ in range(6):
        s.append((encode_imbe7200(imbe_d(b0=90, rng=rng)), []))
    seqs["imbe7200"] = s

    # IMBE 7100 (ProVoice): same regimes through the short-Golay C0 +
    # 100-step PRNG + 7100->7200 convert chain (imbe7100x4400.c:439-496).
    # Data-bit columns differ from 7200: C0 data at fr[0][12..18] (7-bit
    # short-Golay data; corrected before the demod seed is read), C1 data
    # at fr[1][12..23], C2/C3 at cols 11..22, C4/C5 Hamming any column.
    J_C0 = [(0, 14), (0, 17)]
    J_GOLAY = [(1, 13), (1, 17), (1, 22), (2, 13), (2, 17), (2, 22),
               (3, 11), (3, 15), (3, 19)]
    J_HAM = [(4, 2), (5, 8)]
    s = []
    for _ in range(3):
        s.append((encode_imbe7100(imbe_d(b0=100, rng=rng)), []))
    for _ in range(7):                                          # headroom reset
        s.append((encode_imbe7100(imbe_d(b0=220, rng=rng)), []))
    for _ in range(45):                                         # error-rate mute
        s.append((encode_imbe7100(imbe_d(b0=110, rng=rng)),
                  J_C0 + J_GOLAY + J_HAM))
    for _ in range(6):
        s.append((encode_imbe7100(imbe_d(b0=90, rng=rng)), []))
    seqs["imbe7100"] = s
    return seqs


def main():
    r = Ref()
    os.makedirs(OUT, exist_ok=True)
    for codec, seq in sequences().items():
        r.set_seed(424242)
        cur, prev, enh = r.init_parms()
        frames = np.stack([flip_bits(fr, flips) for fr, flips in seq])
        T = frames.shape[0]
        pcm = np.zeros((T, 160), np.float32)
        flags = np.zeros(T, np.int32)
        res = np.zeros((T, 4), np.int32)
        for t in range(T):
            p, ret, rr, d = r.process_frame_f(codec, frames[t], cur, prev, enh)
            pcm[t] = p
            flags[t] = rr["flags"]
            res[t] = [rr["c0"], rr["protected"], rr["c4"], rr["total"]]
        np.savez_compressed(
            os.path.join(OUT, f"fsm_frames_{codec}.npz"),
            frames=frames, pcm=pcm, flags=flags, res=res,
            seed=np.uint32(424242))
        hits = set()
        for f in flags:
            for name, bit in (("T", 0x10), ("E", 0x20), ("R", 0x40),
                              ("M", 0x80)):
                if f & bit:
                    hits.add(name)
        print(codec, "T:", T, "paths hit:", sorted(hits),
              "flags:", [hex(int(f)) for f in flags])


if __name__ == "__main__":
    main()
