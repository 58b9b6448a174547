#!/usr/bin/env python3
"""Round-5 soft-ECC kernel epilogue probes (VERDICT r4 #2).

Times isolated kernel variants on the Golay shape (rows x [KP=40] @
[40, 4096] + epilogue) to find where the 1.0 ms soft-Golay stage goes:

  cur      shipped r5 kernel: i32 convert + mul 2^sd + iota add + i32 min
  floor    dot + f32 min only (NOT a correct decode — epilogue floor)
  twopass  f32 min, eq-mask -> i16 iota select + i16 min, key on [CB,1]
  twopass32  same with i32 iota (if Mosaic dislikes i16)

Each variant's output is folded back into the next iteration's input so
XLA cannot DCE the work (CLAUDE.md perf rule).

Usage: python tools/t_softecc5.py [rows] [iters]
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mbe_tpu.utils.profiling import device_time  # noqa: E402

KP, NCW, SD = 40, 4096, 12


def k_cur(qh_ref, tc_ref, out_ref):
    dot = jax.lax.dot_general(qh_ref[...], tc_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    P = (dot.astype(jnp.int32) * np.int32(1 << SD)
         + jax.lax.broadcasted_iota(jnp.int32, dot.shape, 1))
    out_ref[...] = jnp.min(P, axis=1, keepdims=True)


def k_floor(qh_ref, tc_ref, out_ref):
    dot = jax.lax.dot_general(qh_ref[...], tc_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[...] = jnp.min(dot, axis=1, keepdims=True).astype(jnp.int32)


def k_twopass(qh_ref, tc_ref, out_ref, *, idt):
    dot = jax.lax.dot_general(qh_ref[...], tc_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    m = jnp.min(dot, axis=1, keepdims=True)
    big = jnp.asarray(np.iinfo(idt).max, idt)
    idx = jnp.min(jnp.where(dot == m,
                            jax.lax.broadcasted_iota(idt, dot.shape, 1),
                            big), axis=1, keepdims=True)
    out_ref[...] = (m.astype(jnp.int32) * np.int32(1 << SD)
                    + idx.astype(jnp.int32))


def build(kernel, rows, cb):
    row_spec = pl.BlockSpec((cb, KP), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((KP, NCW), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((cb, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(kernel, grid=(rows // cb,),
                          in_specs=[row_spec, tbl_spec],
                          out_specs=out_spec,
                          out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.int32))

    def body(carry):
        qh, tc = carry
        out = call(qh, tc)
        # fold output back in (bf16-truncated, tiny) to defeat DCE
        return (qh + (out[:, :1] & 3).astype(jnp.bfloat16), tc)
    return body


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cb = 256
    rng = np.random.default_rng(0)
    qh = jnp.asarray(rng.integers(-255, 256, (rows, KP)), jnp.bfloat16)
    tc = jnp.asarray(rng.integers(0, 32, (KP, NCW)), jnp.bfloat16)
    variants = [
        ("cur", k_cur),
        ("floor", k_floor),
        ("twopass16", functools.partial(k_twopass, idt=jnp.int16)),
        ("twopass32", functools.partial(k_twopass, idt=jnp.int32)),
    ]
    for name, kern in variants:
        try:
            t = device_time(build(kern, rows, cb), (qh, tc), iters=iters)
            print(f"{name:12s} {t*1e3:7.3f} ms  ({rows} rows)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
