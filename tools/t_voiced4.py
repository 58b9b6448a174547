#!/usr/bin/env python3
"""Round-4 voiced-kernel probe: fresh floor + attack variants.

VERDICT r3 #1: the voiced Pallas kernel is 26% of the step but its
"0.78 ms no-reduce floor" predates the window fold and the channel-minor
layout. This tool re-measures, in ONE process on the real chip:

  cur       production kernel (ops/pallas/voiced.voiced_sums, cb=128)
  cur256    cb=256 blocks (re-check post-layout-change)
  floor     no-reduce probe: jnp.sum -> row slice (recurrence+stores only)
  unroll    Python-unrolled 20x body (no fori_loop control)
  mxu       per-iteration block-ones dot on the MXU replaces all three
            sublane reduces (prev 64 + cur 64 + interp 8 stacked into a
            [136, 8*cb] scratch, S[8,136] block-row-sum matrix, one
            dot_general per 8 samples)

Usage: python tools/t_voiced4.py [C=16384] [iters=50] [variants]
"""

import os
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
from mbe_tpu.tables import T  # noqa: E402

LP, LI = V.LP, V.LI


# ---------------------------------------------------------------------------
# variant kernels (same signature as production _kernel)
# ---------------------------------------------------------------------------

def _kernel_floor(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                  a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                  r2c_ref, r2s_ref, wp_ref, wc_ref, out_ref):
    """No-reduce floor: row slices instead of harmonic sums."""
    c2p = c2p_ref[...]
    c2c = c2c_ref[...]
    r2c = r2c_ref[...]
    r2s = r2s_ref[...]
    da = da_ref[...]

    def emit8(y0, y1, c2):
        rows = []
        for _ in range(8):
            rows.append(y0[0:1, :])
            y0, y1 = y1, c2 * y1 - y0
        return jnp.concatenate(rows, axis=0), y0, y1

    def emit8i(carry):
        a, oc, osn, dc, dsn = carry
        rows = []
        for _ in range(8):
            rows.append((a * oc)[0:1, :])
            oc, osn = oc * dc - osn * dsn, osn * dc + oc * dsn
            dc, dsn = dc * r2c - dsn * r2s, dsn * r2c + dc * r2s
            a = a + da
        return jnp.concatenate(rows, axis=0), (a, oc, osn, dc, dsn)

    def body(n, carry):
        y0p, y1p, y0c, y1c, ic = carry
        rp, y0p, y1p = emit8(y0p, y1p, c2p)
        rc, y0c, y1c = emit8(y0c, y1c, c2c)
        ri, ic = emit8i(ic)
        out_ref[pl.ds(n * 8, 8), :] = (
            wp_ref[pl.ds(n * 8, 8), :] * rp
            + wc_ref[pl.ds(n * 8, 8), :] * rc + ri)
        return y0p, y1p, y0c, y1c, ic

    jax.lax.fori_loop(
        0, 20, body,
        (y0p_ref[...], y1p_ref[...], y0c_ref[...], y1c_ref[...],
         (a0_ref[...], oc_ref[...], os_ref[...],
          dc_ref[...], ds_ref[...])))


def _kernel_unroll(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                   a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                   r2c_ref, r2s_ref, wp_ref, wc_ref, out_ref):
    """Production math, Python-unrolled outer loop (no fori_loop)."""
    c2p = c2p_ref[...]
    c2c = c2c_ref[...]
    r2c = r2c_ref[...]
    r2s = r2s_ref[...]
    da = da_ref[...]

    def emit8(y0, y1, c2):
        rows = []
        for _ in range(8):
            rows.append(jnp.sum(y0, axis=0, keepdims=True))
            y0, y1 = y1, c2 * y1 - y0
        return jnp.concatenate(rows, axis=0), y0, y1

    def emit8i(carry):
        a, oc, osn, dc, dsn = carry
        rows = []
        for _ in range(8):
            rows.append(jnp.sum(a * oc, axis=0, keepdims=True))
            oc, osn = oc * dc - osn * dsn, osn * dc + oc * dsn
            dc, dsn = dc * r2c - dsn * r2s, dsn * r2c + dc * r2s
            a = a + da
        return jnp.concatenate(rows, axis=0), (a, oc, osn, dc, dsn)

    y0p, y1p = y0p_ref[...], y1p_ref[...]
    y0c, y1c = y0c_ref[...], y1c_ref[...]
    ic = (a0_ref[...], oc_ref[...], os_ref[...], dc_ref[...], ds_ref[...])
    for n in range(20):
        rp, y0p, y1p = emit8(y0p, y1p, c2p)
        rc, y0c, y1c = emit8(y0c, y1c, c2c)
        ri, ic = emit8i(ic)
        out_ref[n * 8:(n + 1) * 8, :] = (
            wp_ref[n * 8:(n + 1) * 8, :] * rp
            + wc_ref[n * 8:(n + 1) * 8, :] * rc + ri)


def _kernel_mxu(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                r2c_ref, r2s_ref, wp_ref, wc_ref, out_ref, sb_ref):
    """All three harmonic sums offloaded to the MXU: per 8-sample block,
    stack the prev/cur oscillator states and interp products into a
    [136, 8*cb] scratch, then one S[8,136] @ sb dot; S's first three rows
    are the block-row-sum masks (prev / cur / interp)."""
    c2p = c2p_ref[...]
    c2c = c2c_ref[...]
    r2c = r2c_ref[...]
    r2s = r2s_ref[...]
    da = da_ref[...]
    cb = y0p_ref.shape[1]

    jrow = jax.lax.broadcasted_iota(jnp.int32, (8, 136), 0)
    jcol = jnp.minimum(jax.lax.broadcasted_iota(jnp.int32, (8, 136), 1)
                       // 64, 2)
    S = (jrow == jcol).astype(jnp.float32)  # rows 0..2 live, 3..7 zero

    def body(n, carry):
        y0p, y1p, y0c, y1c, (a, oc, osn, dc, dsn) = carry
        for k in range(8):
            sb_ref[0:LP, k * cb:(k + 1) * cb] = y0p
            sb_ref[LP:2 * LP, k * cb:(k + 1) * cb] = y0c
            sb_ref[2 * LP:2 * LP + LI, k * cb:(k + 1) * cb] = a * oc
            y0p, y1p = y1p, c2p * y1p - y0p
            y0c, y1c = y1c, c2c * y1c - y0c
            oc, osn = oc * dc - osn * dsn, osn * dc + oc * dsn
            dc, dsn = dc * r2c - dsn * r2s, dsn * r2c + dc * r2s
            a = a + da
        R = jax.lax.dot_general(S, sb_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rp = R[0:1, :].reshape(8, cb)
        rc = R[1:2, :].reshape(8, cb)
        ri = R[2:3, :].reshape(8, cb)
        out_ref[pl.ds(n * 8, 8), :] = (
            wp_ref[pl.ds(n * 8, 8), :] * rp
            + wc_ref[pl.ds(n * 8, 8), :] * rc + ri)
        return y0p, y1p, y0c, y1c, (a, oc, osn, dc, dsn)

    jax.lax.fori_loop(
        0, 20, body,
        (y0p_ref[...], y1p_ref[...], y0c_ref[...], y1c_ref[...],
         (a0_ref[...], oc_ref[...], os_ref[...],
          dc_ref[...], ds_ref[...])))


def call_variant(kernel, args, c, cb=128, scratch=False, interpret=False):
    in_spec = pl.BlockSpec((LP, cb), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    in_spec7 = pl.BlockSpec((LI, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((160, cb), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((160, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((2 * LP + LI, 8 * cb),
                                           jnp.float32)]
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(c // cb,),
        in_specs=[in_spec] * 6 + [in_spec7] * 8 + [w_spec, w_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((160, c), jnp.float32),
        **kw,
    )(*args)


# ---------------------------------------------------------------------------
# inputs + timing
# ---------------------------------------------------------------------------

def make_inputs(c):
    rng = np.random.default_rng(0)
    L = rng.integers(9, 57, c)
    w0 = (2 * np.pi * 0.4875 / (L + 0.25)).astype(np.float32)
    lcol = np.arange(1, 57, dtype=np.float32)[:, None]
    act = (lcol <= L[None, :]).astype(np.float32)
    vp = act * (rng.random((56, c)) < 0.6)
    vc = act * (rng.random((56, c)) < 0.6)
    gp = (2 * rng.uniform(0.1, 500, (56, c)) * vp).astype(np.float32)
    gc = (2 * rng.uniform(0.1, 500, (56, c)) * vc).astype(np.float32)
    php = rng.uniform(0, 2 * np.pi, (56, c)).astype(np.float32)
    phc = rng.uniform(0, 2 * np.pi, (56, c)).astype(np.float32)
    stp = (w0[None, :] * lcol).astype(np.float32)
    ia = (rng.uniform(0, 500, (7, c)) * vp[:7]).astype(np.float32)
    ida = rng.uniform(-2, 2, (7, c)).astype(np.float32)
    iph = rng.uniform(0, 2 * np.pi, (7, c)).astype(np.float32)
    ial = stp[:7]
    iq = rng.uniform(-1e-4, 1e-4, (7, c)).astype(np.float32)
    ws = np.asarray(T.Ws, np.float32)
    return (gp, php, stp, gc, phc - stp * 160.0, stp,
            ia, ida, iph, ial, iq), ws[160:320], ws[:160]


def prep_args(inp, wprev, wcur, cb):
    (gp, php, stp, gc, phc0, stc, ia, ida, iph, ial, iq) = [
        jnp.asarray(x) for x in inp]

    def prep(g, phi, step):
        gT = jnp.pad(g, ((0, LP - 56), (0, 0)))
        phiT = jnp.pad(phi, ((0, LP - 56), (0, 0)))
        stepT = jnp.pad(step, ((0, LP - 56), (0, 0)))
        return (gT * jnp.cos(phiT), gT * jnp.cos(phiT + stepT),
                jnp.float32(2.0) * jnp.cos(stepT))

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


def timed(fn, args, iters):
    """Device-side scan; perturbs one input per step so nothing hoists,
    consumes the output row sum."""
    def body(carry, _):
        acc = carry
        newargs = (args[0] + acc * 1e-30,) + args[1:]
        out = fn(newargs)
        return acc + out[0, :], 0

    c = args[0].shape[1]
    run = jax.jit(lambda a0: jax.lax.scan(body, a0, None, length=iters)[0])
    a0 = jnp.zeros((c,), jnp.float32)
    jax.block_until_ready(run(a0))
    t0 = time.time()
    jax.block_until_ready(run(a0))
    return (time.time() - t0) / iters


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    interpret = jax.default_backend() != "tpu"
    inp, wprev, wcur = make_inputs(c)

    variants = {
        "cur": lambda a: call_variant(V._kernel, a, c, 128),
        "cur256": lambda a: call_variant(V._kernel, a, c, 256),
        "floor": lambda a: call_variant(_kernel_floor, a, c, 128),
        "unroll": lambda a: call_variant(_kernel_unroll, a, c, 128),
        "mxu": lambda a: call_variant(_kernel_mxu, a, c, 128, scratch=True),
        "mxu256": lambda a: call_variant(_kernel_mxu, a, c, 256,
                                         scratch=True),
    }
    if only:
        variants = {k: v for k, v in variants.items() if k in only}

    args128 = prep_args(inp, wprev, wcur, 128)
    args256 = prep_args(inp, wprev, wcur, 256)

    # correctness check vs production first (on-device, small slice)
    ref = np.asarray(call_variant(V._kernel, args128, c, 128,
                                  interpret=interpret))
    for name, fn in variants.items():
        if name == "floor":
            continue
        a = args256 if name.endswith("256") else args128
        try:
            out = np.asarray(fn(a) if not interpret else call_variant(
                {"cur": V._kernel, "cur256": V._kernel,
                 "unroll": _kernel_unroll, "mxu": _kernel_mxu,
                 "mxu256": _kernel_mxu}[name], a, c,
                256 if name.endswith("256") else 128,
                scratch=name.startswith("mxu"), interpret=True))
        except Exception as e:
            print(f"{name}: FAILED to run: {type(e).__name__}: {e}")
            variants[name] = None
            continue
        scale = max(1e-9, np.abs(ref).max())
        err = np.abs(out - ref).max() / scale
        print(f"{name}: max rel err vs cur = {err:.2e}")

    if interpret:
        print("(CPU interpret mode: correctness only, no timing)")
        return

    for name, fn in variants.items():
        if fn is None:
            continue
        a = args256 if name.endswith("256") else args128
        try:
            dt = timed(fn, a, iters)
        except Exception as e:
            print(f"{name}: timing FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:8s} C={c}: {dt*1e3:7.3f} ms  "
              f"({c/dt/1e6:6.2f} M ch/s)", flush=True)


if __name__ == "__main__":
    main()
