#!/usr/bin/env python3
"""Golden vectors from a DISABLE_AMBE_TONES reference build.

The reference's NOTONES CMake option (CMakePresets.json notones-debug;
mbelib.c:747-751) compiles mbe_synthesizeTonef/Tonefdstar down to silence
while leaving classification, flags, and all non-tone state untouched.
Replays the exact tone-bearing FSM sequences of gen_fsm_vectors.py against
a notones build (cmake -DNOTONES=ON -B /tmp/refbuild_notones) so the
framework's DecoderConfig(tones_enabled=False) path can be golden-tested.

Run: MBE_REF_LIB=/tmp/refbuild_notones/libmbe-neo.so python tools/gen_notones_vectors.py
(the script sets MBE_REF_LIB itself if unset).
"""

import os
import sys

import numpy as np

os.environ.setdefault("MBE_REF_LIB", "/tmp/refbuild_notones/libmbe-neo.so")
sys.path.insert(0, os.path.dirname(__file__))
from gen_fsm_vectors import sequences  # noqa: E402
from ref import Ref  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "vectors")


def main():
    r = Ref()
    os.makedirs(OUT, exist_ok=True)
    for codec in ("ambe2450", "ambe2400"):  # the tone-capable codecs
        seq = sequences()[codec]
        r.set_seed(12345)
        cur, prev, enh = r.init_parms()
        dbits = np.stack([d for d, _ in seq])
        totals = np.array([t for _, t in seq], np.int32)
        pcm = np.zeros((len(seq), 160), np.float32)
        flags = np.zeros(len(seq), np.int32)
        for t, (d, te) in enumerate(seq):
            p, ret, res = r.process_data_f(codec, d, cur, prev, enh, te)
            pcm[t] = p
            flags[t] = res["flags"]
        np.savez_compressed(
            os.path.join(OUT, f"fsm_notones_{codec}.npz"),
            dbits=dbits, totals=totals, pcm=pcm, flags=flags,
            seed=np.uint32(12345))
        print(codec, "flags:", [hex(f) for f in flags])


if __name__ == "__main__":
    main()
