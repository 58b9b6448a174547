#!/usr/bin/env python3
"""Round-4 voiced-kernel probe, part 2: reduce-cost attack.

t_voiced4.py established at C=32768 (2026-08-19, one process):
  cur 1.404 ms / cur256 1.393 / floor(no-reduce) 0.842 / unroll 1.231 /
  mxu 1.636 (+1.6e-3 err — bf16 MXU passes; dead end).

So: full unroll of the 20-iteration fori_loop is a 1.14x stage win, and
the remaining gap to floor (~0.39 ms) is the three per-sample harmonic
reduces. This probe attacks that gap:

  unroll     LP=64 Python-unrolled (t_voiced4 winner, re-measured)
  unroll56   LP=56: drop the 8 zero pad sublanes (inputs are [56, C]
             already — 56 = 7 f32 vregs, tile-aligned); 12.5% fewer
             recurrence + fold ops
  unrollW    unroll56 + merged collapse: fold each component to one
             [8, CB] vreg (6 adds), apply the per-sample window scalars
             THERE, add the interp vreg, then ONE 8-sublane column sum
             instead of three separate jnp.sums
  unroll56x256  unroll56 with cb=256 blocks

Usage: python tools/t_voiced4b.py [C=32768] [iters=50] [variants]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mbe_tpu.ops.pallas import voiced as V  # noqa: E402
from tools.t_voiced4 import (  # noqa: E402
    _kernel_unroll, make_inputs, timed)

LI = V.LI


def _kernel_unroll56(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                     a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                     r2c_ref, r2s_ref, wp_ref, wc_ref, out_ref):
    """unroll with LP=56 (no zero pad sublanes)."""
    _kernel_unroll(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                   a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                   r2c_ref, r2s_ref, wp_ref, wc_ref, out_ref)


def _kernel_unrollW(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                    a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                    r2c_ref, r2s_ref, wp_ref, wc_ref, out_ref):
    """Merged collapse: window the [8, CB] component partials, one sum."""
    c2p = c2p_ref[...]
    c2c = c2c_ref[...]
    r2c = r2c_ref[...]
    r2s = r2s_ref[...]
    da = da_ref[...]

    def fold8(y):  # [56, CB] -> [8, CB] partial (6 vreg adds)
        acc = y[0:8, :]
        for v in range(1, 7):
            acc = acc + y[8 * v:8 * (v + 1), :]
        return acc

    y0p, y1p = y0p_ref[...], y1p_ref[...]
    y0c, y1c = y0c_ref[...], y1c_ref[...]
    a, oc, osn, dc, dsn = (a0_ref[...], oc_ref[...], os_ref[...],
                           dc_ref[...], ds_ref[...])
    for n in range(20):
        rows = []
        for k in range(8):
            w = (wp_ref[n * 8 + k:n * 8 + k + 1, :] * fold8(y0p)
                 + wc_ref[n * 8 + k:n * 8 + k + 1, :] * fold8(y0c)
                 + a * oc)
            rows.append(jnp.sum(w, axis=0, keepdims=True))
            y0p, y1p = y1p, c2p * y1p - y0p
            y0c, y1c = y1c, c2c * y1c - y0c
            oc, osn = oc * dc - osn * dsn, osn * dc + oc * dsn
            dc, dsn = dc * r2c - dsn * r2s, dsn * r2c + dc * r2s
            a = a + da
        out_ref[n * 8:(n + 1) * 8, :] = jnp.concatenate(rows, axis=0)


def call56(kernel, args, c, cb=128, interpret=False):
    in_spec = pl.BlockSpec((56, cb), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    in_spec7 = pl.BlockSpec((LI, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((160, cb), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((160, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(c // cb,),
        in_specs=[in_spec] * 6 + [in_spec7] * 8 + [w_spec, w_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((160, c), jnp.float32),
    )(*args)


def prep56(inp, wprev, wcur, cb):
    """Like t_voiced4.prep_args but WITHOUT the 56->64 harmonic pad."""
    (gp, php, stp, gc, phc0, stc, ia, ida, iph, ial, iq) = [
        jnp.asarray(x) for x in inp]

    def prep(g, phi, step):
        return (g * jnp.cos(phi), g * jnp.cos(phi + step),
                jnp.float32(2.0) * jnp.cos(step))

    a = prep(gp, php, stp)
    b = prep(gc, phc0, stc)

    def prep7(x):
        return jnp.pad(x, ((0, LI - 7), (0, 0)))

    a0, da = prep7(ia), prep7(ida)
    phi0, alpha, q = prep7(iph), prep7(ial), prep7(iq)
    delta0 = alpha + q
    iv = (a0, da, jnp.cos(phi0), jnp.sin(phi0),
          jnp.cos(delta0), jnp.sin(delta0),
          jnp.cos(2.0 * q), jnp.sin(2.0 * q))
    wp = jnp.broadcast_to(jnp.asarray(wprev, jnp.float32)[:, None],
                          (160, cb))
    wc = jnp.broadcast_to(jnp.asarray(wcur, jnp.float32)[:, None],
                          (160, cb))
    return (*a, *b, *iv, wp, wc)


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    interpret = jax.default_backend() != "tpu"
    inp, wprev, wcur = make_inputs(c)

    from tools.t_voiced4 import call_variant, prep_args
    args64 = prep_args(inp, wprev, wcur, 128)
    a56_128 = prep56(inp, wprev, wcur, 128)
    a56_256 = prep56(inp, wprev, wcur, 256)

    variants = {
        "unroll": lambda: (call_variant, _kernel_unroll, args64, 128, False),
        "unroll56": lambda: (call56, _kernel_unroll56, a56_128, 128, False),
        "unrollW": lambda: (call56, _kernel_unrollW, a56_128, 128, False),
        "unroll56x256": lambda: (call56, _kernel_unroll56, a56_256, 256,
                                 False),
    }
    if only:
        variants = {k: v for k, v in variants.items() if k in only}

    ref = np.asarray(call_variant(V._kernel, args64, c, 128,
                                  interpret=interpret))
    runners = {}
    for name, get in variants.items():
        call, kern, args, cb, _ = get()
        fn = (lambda a, call=call, kern=kern, cb=cb:
              call(kern, a, c, cb, interpret=interpret))
        try:
            out = np.asarray(fn(args))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {e}")
            continue
        err = np.abs(out - ref).max() / max(1e-9, np.abs(ref).max())
        print(f"{name}: max rel err vs cur = {err:.2e}", flush=True)
        runners[name] = (fn, args)

    if interpret:
        print("(CPU interpret mode: correctness only)")
        return
    for name, (fn, args) in runners.items():
        dt = timed(fn, args, iters)
        print(f"{name:14s} C={c}: {dt*1e3:7.3f} ms  "
              f"({c/dt/1e6:6.2f} M ch/s)", flush=True)


if __name__ == "__main__":
    main()
