#!/usr/bin/env python3
"""A/B: sparse vs dense incidence lists in the IMBE param decode.

Side A (dense) monkeypatches _decode_tables to full incidence lists —
col_bits = all 88 bits per column, band_slots = all 60 slots, band_ts =
all 12 voicing bits — reproducing the round-2 dense compare-reduce
workload (6336/3420/684 pairs). Side B is the shipped sparse tables
(1125/720/245). One process, interleaved (tools/ab_bench.ab); side A is
compiled BEFORE the patch is reverted (jit traces at first call).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

from ab_bench import build, init_for, ab  # noqa: E402
from mbe_tpu.models import imbe  # noqa: E402

CODEC = "imbe7200"
C = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

real_tables = imbe._decode_tables


def dense_tables():
    tb = dict(real_tables())
    tb["col_bits"] = [list(range(88))] * tb["NCOLS"]
    tb["band_slots"] = [list(range(60))] * 57
    tb["band_ts"] = [list(range(12))] * 57
    return tb


# side A: dense (compile while patched)
imbe._decode_tables = dense_tables
fn_a, steps = build(CODEC, C)
jax.block_until_ready(fn_a(init_for(CODEC, C)))

# side B: sparse
imbe._decode_tables = real_tables
fn_b, _ = build(CODEC, C)
jax.block_until_ready(fn_b(init_for(CODEC, C)))

a, b = ab(fn_a, fn_b, C, steps, rounds=3, codec=CODEC)
print(f"dense : {a*1e3:.3f} ms/step ({C/a/1e6:.2f}M f/s)")
print(f"sparse: {b*1e3:.3f} ms/step ({C/b/1e6:.2f}M f/s)")
print(f"speedup: {a/b:.3f}x")
