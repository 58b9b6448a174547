#!/usr/bin/env python3
"""Generate golden test vectors from the reference library into tests/vectors/.

Requires a built reference (tools/build_reference.sh). The committed vectors
make the pytest suite hermetic — it never touches /root/reference.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from encode_frames import encode_ambe3600, encode_imbe7200, flip_bits  # noqa: E402
from gen_fsm_vectors import ambe2400_d, ambe2450_d, imbe_d  # noqa: E402
from gen_frame_fsm_vectors import (C0_DATA, C1_DATA, I_C0, I_GOLAY, I_HAM,  # noqa: E402
                                   tone2450)
from ref import Ref  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")

CODECS = {
    "imbe7200": (8, 23),
    "imbe7100": (7, 24),
    "ambe2450": (4, 24),
    "ambe2400": (4, 24),
}


def _regime_channel(codec, kind, T, rng):
    """A T-frame crafted sequence emphasizing one FSM regime, as full
    over-the-air frames (imbe7100 has no encoder here — callers skip it)."""
    frames = []
    heavy = dict(ambe2450=C0_DATA + C1_DATA, ambe2400=C0_DATA[:1] + C1_DATA,
                 imbe7200=I_C0 + I_GOLAY + I_HAM)[codec]
    for t in range(T):
        if codec == "ambe2450":
            if kind == "tone":
                d, flips = (tone2450(15 + (t % 30)), []) if t % 3 else \
                           (ambe2450_d(b0=40 + t % 40, rng=rng), [])
            elif kind == "special":  # silence / erasure / invalid-tone mix
                pick = t % 4
                d = (ambe2450_d(b0=124) if pick == 0 else
                     ambe2450_d(b0=125) if pick == 1 else
                     ambe2450_d(b0=121, rng=rng) if pick == 2 else
                     ambe2450_d(tone_id=200))
                flips = []
            else:  # repeat/mute streaks with recovery
                streak = (t // 8) % 2 == 1
                d = ambe2450_d(b0=50 + t % 30, rng=rng)
                flips = heavy if streak else []
            frames.append(flip_bits(encode_ambe3600(d), flips))
        elif codec == "ambe2400":
            if kind == "tone":
                d, flips = (ambe2400_d(tone_id=40 + (t % 80)), []) if t % 3 \
                    else (ambe2400_d(b0=40 + t % 40, rng=rng), [])
            elif kind == "special":
                pick = t % 3
                d = (ambe2400_d(tone_id=200) if pick == 0 else  # silence class
                     ambe2400_d(tone_id=0) if pick == 1 else
                     ambe2400_d(b0=60 + t % 20, rng=rng))
                flips = []
            else:
                streak = (t // 8) % 2 == 1
                d = ambe2400_d(b0=50 + t % 30, rng=rng)
                flips = heavy if streak else []
            frames.append(flip_bits(encode_ambe3600(d), flips))
        else:  # imbe7200
            if kind == "tone":  # no tones in IMBE: invalid-fundamental lanes
                d = imbe_d(b0=220 + t % 30, rng=rng) if t % 3 else \
                    imbe_d(b0=100 + t % 50, rng=rng)
                flips = []
            elif kind == "special":
                d = imbe_d(b0=205 + t % 40, rng=rng)  # mix valid/invalid b0
                flips = []
            else:
                streak = (t // 10) % 2 == 1
                d = imbe_d(b0=110 + t % 40, rng=rng)
                flips = heavy if streak else []
            frames.append(flip_bits(encode_imbe7200(d), flips))
    return np.stack(frames)


def gen_ecc(r, rng):
    n = 256
    out = {}
    b23 = rng.integers(0, 2, (n, 23)).astype(np.int32)
    r23 = rng.integers(0, 256, (n, 23)).astype(np.int32)
    b15 = rng.integers(0, 2, (n, 15)).astype(np.int32)
    r15 = rng.integers(0, 256, (n, 15)).astype(np.int32)
    out["golay_in"] = b23
    out["golay_rel"] = r23
    out["ham_in"] = b15
    out["ham_rel"] = r15

    def run(fn, args_list):
        outs, errs = [], []
        for args in args_list:
            o, e = fn(*args)
            outs.append(o)
            errs.append(e)
        return np.stack(outs), np.array(errs, np.int32)

    out["golay_hard_out"], out["golay_hard_errs"] = run(
        r.golay2312, [(b,) for b in b23])
    out["golay_soft_out"], out["golay_soft_errs"] = run(
        r.golay2312_soft, list(zip(b23, r23)))
    out["ham_hard_out"], out["ham_hard_errs"] = run(
        r.hamming1511, [(b,) for b in b15])
    out["ham7100_hard_out"], out["ham7100_hard_errs"] = run(
        r.hamming1511_7100, [(b,) for b in b15])
    out["ham_soft_out"], out["ham_soft_errs"] = run(
        r.hamming1511_soft, list(zip(b15, r15)))
    out["ham7100_soft_out"], out["ham7100_soft_errs"] = run(
        r.hamming1511_7100_soft, list(zip(b15, r15)))
    return out


def gen_e2e(r, rng, codec, T=40, C=16, soft=False):
    rows, cols = CODECS[codec]
    frames = rng.integers(0, 2, (T, C, rows, cols)).astype(np.int32)
    # Hard-path vectors: the last 3 channels are crafted FSM-regime streams
    # (tone/silence/erasure/repeat) through the full frame path; soft vectors
    # stay fully random so the exhaustive-ML decode itself defines truth.
    # imbe7100 has no frame encoder — all channels random there.
    if not soft and codec != "imbe7100" and C >= 8:
        for ci, kind in zip(range(C - 3, C), ("tone", "special", "repeat")):
            frames[:, ci] = _regime_channel(codec, kind, T, rng)
    rel = rng.integers(0, 256, (T, C, rows, cols)).astype(np.int32) if soft else None
    seeds = rng.integers(1, 2**31, C).astype(np.uint32)

    pcm = np.zeros((T, C, 160), np.float32)
    pcm16 = np.zeros((T, C, 160), np.int16)
    res = np.zeros((T, C, 4), np.int32)
    flags = np.zeros((T, C), np.int32)
    dbits = np.zeros((T, C, 88 if codec.startswith("imbe") else 49), np.int32)
    for i in range(C):
        r.set_seed(int(seeds[i]))
        cur, prev, enh = r.init_parms()
        for t in range(T):
            sr = rel[t, i] if soft else None
            p, ret, rr, d = r.process_frame_f(codec, frames[t, i], cur, prev,
                                              enh, soft_rel=sr)
            pcm[t, i] = p
            pcm16[t, i] = r.float_to_short(p)
            res[t, i] = [rr["c0"], rr["protected"], rr["c4"], rr["total"]]
            flags[t, i] = rr["flags"]
            dbits[t, i] = d
    out = dict(frames=frames, seeds=seeds, pcm=pcm, pcm16=pcm16, res=res,
               flags=flags, dbits=dbits)
    if soft:
        out["rel"] = rel
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    r = Ref()
    rng = np.random.default_rng(20260816)

    np.savez_compressed(os.path.join(OUT, "ecc.npz"), **gen_ecc(r, rng))
    print("ecc.npz done")
    for codec in CODECS:
        np.savez_compressed(os.path.join(OUT, f"e2e_{codec}.npz"),
                            **gen_e2e(r, rng, codec))
        print(f"e2e_{codec}.npz done")
        np.savez_compressed(os.path.join(OUT, f"e2e_{codec}_soft.npz"),
                            **gen_e2e(r, rng, codec, soft=True))
        print(f"e2e_{codec}_soft.npz done")
        # long-horizon drift vectors: T=200, C=4, all four codecs
        np.savez_compressed(os.path.join(OUT, f"long_{codec}.npz"),
                            **gen_e2e(r, rng, codec, T=200, C=4))
        print(f"long_{codec}.npz done")


if __name__ == "__main__":
    main()
