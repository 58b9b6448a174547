#!/usr/bin/env python3
"""Golden vectors for the frame-type FSM paths that random frames rarely hit:
tone (valid/invalid), silence, erasure streaks, repeat-to-mute, IMBE
headroom reset and error-rate muting. Driven at the process-data level (the
reference's mbe_process*Dataf) with crafted parameter-bit sequences."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from ref import Ref  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")


def ambe2450_d(b0=None, tone_id=None, rng=None, total=None):
    d = (rng.integers(0, 2, 49) if rng is not None
         else np.zeros(49)).astype(np.int32)
    if tone_id is not None:
        d[0:6] = 1                      # u0 tone check
        d[45:49] = 0                    # u3 low nibble zero
        for i, s in zip(range(12, 20), range(7, -1, -1)):
            d[i] = (tone_id >> s) & 1   # ID1
    elif b0 is not None:
        d[0:6] = 0  # defeat the tone check (u0 top6 != 63)
        for pos, s in zip([0, 1, 2, 3, 37, 38, 39], range(6, -1, -1)):
            d[pos] = (b0 >> s) & 1
    return d


def ambe2400_d(b0=None, tone_id=None, rng=None):
    d = (rng.integers(0, 2, 49) if rng is not None
         else np.zeros(49)).astype(np.int32)
    if b0 is not None:
        for pos, s in zip([0, 1, 2, 3, 4, 5, 48], range(6, -1, -1)):
            d[pos] = (b0 >> s) & 1
    if tone_id is not None:
        # b0 & 0x7E == 0x7E with the scrambled index = tone_id
        for pos, s in zip([0, 1, 2, 3, 4, 5, 48], range(6, -1, -1)):
            d[pos] = (0x7E >> s) & 1
        # choose def bits so t7/t6/t5 produce the top bits of tone_id
        t7, t6, t5 = (tone_id >> 7) & 1, (tone_id >> 6) & 1, (tone_id >> 5) & 1
        t7tab = [1, 0, 0, 0, 0, 1, 1, 1]
        t6tab = [0, 0, 0, 1, 1, 1, 1, 0]
        t5tab = [0, 0, 1, 0, 1, 1, 0, 1]
        defv = next(v for v in range(8)
                    if (t7tab[v], t6tab[v], t5tab[v]) == (t7, t6, t5))
        d[6], d[7], d[8] = (defv >> 2) & 1, (defv >> 1) & 1, defv & 1
        d[9] = (tone_id >> 4) & 1
        d[42] = (tone_id >> 3) & 1
        d[43] = (tone_id >> 2) & 1
        d[10] = (tone_id >> 1) & 1
        d[11] = tone_id & 1
    return d


def imbe_d(b0=None, rng=None):
    d = (rng.integers(0, 2, 88) if rng is not None
         else np.zeros(88)).astype(np.int32)
    if b0 is not None:
        for pos, s in zip([0, 1, 2, 3, 4, 5, 85, 86], range(7, -1, -1)):
            d[pos] = (b0 >> s) & 1
    return d


def sequences():
    rng = np.random.default_rng(4242)
    seqs = {}

    # AMBE+2 2450: voice -> valid tone -> invalid tone -> silence -> erasure
    # streak -> repeat streak to mute/reinit -> recovery voice
    s = []
    for _ in range(3):
        s.append((ambe2450_d(b0=40, rng=rng), 0))
    for _ in range(2):
        s.append((ambe2450_d(tone_id=20), 0))       # valid single tone
    for _ in range(2):
        s.append((ambe2450_d(tone_id=200), 0))      # invalid tone id
    s.append((ambe2450_d(b0=124), 0))               # silence W124
    s.append((ambe2450_d(b0=125), 0))               # silence W125
    for _ in range(3):
        s.append((ambe2450_d(b0=121, rng=rng), 2))  # erasure streak
    for _ in range(6):
        s.append((ambe2450_d(b0=50, rng=rng), 8))   # repeats -> mute+reinit
    s.append((ambe2450_d(tone_id=20), 8))           # tone BER gate -> erasure
    for _ in range(4):
        s.append((ambe2450_d(b0=60, rng=rng), 0))   # recovery
    seqs["ambe2450"] = s

    # AMBE 2400: voice -> valid D-STAR tone -> noisy tone -> silence ->
    # repeat streak -> recovery
    s = []
    for _ in range(3):
        s.append((ambe2400_d(b0=40, rng=rng), 0))
    for _ in range(2):
        s.append((ambe2400_d(tone_id=60), 0))       # valid D-STAR tone
    s.append((ambe2400_d(tone_id=60), 5))           # errors -> comfort+reinit
    s.append((ambe2400_d(tone_id=200), 0))          # invalid -> silence model
    for _ in range(6):
        s.append((ambe2400_d(b0=50, rng=rng), 8))   # repeats -> mute+reinit
    for _ in range(4):
        s.append((ambe2400_d(b0=70, rng=rng), 0))
    seqs["ambe2400"] = s

    # IMBE 7200: voice -> invalid fundamental -> repeat streak (headroom
    # reset) -> high-error voice (error-rate muting) -> recovery
    s = []
    for _ in range(3):
        s.append((imbe_d(b0=100, rng=rng), 0))
    s.append((imbe_d(b0=220, rng=rng), 0))          # invalid fundamental
    for _ in range(6):
        s.append((imbe_d(b0=220, rng=rng), 0))      # keep repeating -> reset
    for _ in range(6):
        s.append((imbe_d(b0=110, rng=rng), 150))    # drive errorRate up
    for _ in range(6):
        s.append((imbe_d(b0=90, rng=rng), 0))       # recover
    seqs["imbe7200"] = s
    return seqs


def main():
    r = Ref()
    os.makedirs(OUT, exist_ok=True)
    for codec, seq in sequences().items():
        r.set_seed(12345)
        cur, prev, enh = r.init_parms()
        dbits = np.stack([d for d, _ in seq])
        totals = np.array([t for _, t in seq], np.int32)
        pcm = np.zeros((len(seq), 160), np.float32)
        flags = np.zeros(len(seq), np.int32)
        rtot = np.zeros(len(seq), np.int32)
        for t, (d, te) in enumerate(seq):
            p, ret, res = r.process_data_f(codec, d, cur, prev, enh, te)
            pcm[t] = p
            flags[t] = res["flags"]
            rtot[t] = res["total"]
        np.savez_compressed(
            os.path.join(OUT, f"fsm_{codec}.npz"),
            dbits=dbits, totals=totals, pcm=pcm, flags=flags, rtot=rtot,
            seed=np.uint32(12345))
        print(codec, "flags:", [hex(f) for f in flags])


if __name__ == "__main__":
    main()
