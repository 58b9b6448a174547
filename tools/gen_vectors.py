#!/usr/bin/env python3
"""Generate golden test vectors from the reference library into tests/vectors/.

Requires a built reference (tools/build_reference.sh). The committed vectors
make the pytest suite hermetic — it never touches /root/reference.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from ref import Ref  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")

CODECS = {
    "imbe7200": (8, 23),
    "imbe7100": (7, 24),
    "ambe2450": (4, 24),
    "ambe2400": (4, 24),
}


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


def gen_e2e(r, rng, codec, T=30, C=4, soft=False):
    rows, cols = CODECS[codec]
    frames = rng.integers(0, 2, (T, C, rows, cols)).astype(np.int32)
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


if __name__ == "__main__":
    main()
