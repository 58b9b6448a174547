# ARCHIVAL EVIDENCE (round-2/3): written against the pre-round-3
# channel-MAJOR layout; the measurements it documents are recorded in
# docs/PERFORMANCE.md. Not runnable on the channel-minor build.
"""A/B: window-folded single-output voiced kernel vs the old 3-output form.

Side A (old): 3-output kernel + XLA window epilogue (inlined copy of the
round-2 kernel below). Side B (new): production voiced_sums with in-kernel
windows. Same process; side A is compiled (called) BEFORE patching in side
B (jit traces at first call — CLAUDE.md lesson).

Run on TPU: python tools/t_ab_voicedw.py [channels] [reps]
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

import ab_bench  # noqa: E402
from mbe_tpu.ops.pallas import voiced as pv  # noqa: E402


def _kernel_old(y0p_ref, y1p_ref, c2p_ref, y0c_ref, y1c_ref, c2c_ref,
                a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
                r2c_ref, r2s_ref, outp_ref, outc_ref, outi_ref):
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

    def body(n, carry):
        y0p, y1p, y0c, y1c, ic = carry
        rp, y0p, y1p = emit8(y0p, y1p, c2p)
        rc, y0c, y1c = emit8(y0c, y1c, c2c)
        ri, ic = emit8i(ic)
        outp_ref[pl.ds(n * 8, 8), :] = rp
        outc_ref[pl.ds(n * 8, 8), :] = rc
        outi_ref[pl.ds(n * 8, 8), :] = ri
        return y0p, y1p, y0c, y1c, ic

    jax.lax.fori_loop(
        0, 20, body,
        (y0p_ref[...], y1p_ref[...], y0c_ref[...], y1c_ref[...],
         (a0_ref[...], oc_ref[...], os_ref[...],
          dc_ref[...], ds_ref[...])))


def voiced_sums_old(gain_prev, phi_prev, step_prev, gain_cur, phi_cur0,
                    step_cur, interp_amp0, interp_damp, interp_phi0,
                    interp_alpha, interp_q, w_prev, w_cur,
                    interpret=False, cb=pv.CB):
    LP, LI = pv.LP, pv.LI
    c = gain_prev.shape[0]

    def prep(g, phi, step):
        gT = jnp.pad(g.T, ((0, LP - 56), (0, 0)))
        phiT = jnp.pad(phi.T, ((0, LP - 56), (0, 0)))
        stepT = jnp.pad(step.T, ((0, LP - 56), (0, 0)))
        return (gT * jnp.cos(phiT), gT * jnp.cos(phiT + stepT),
                jnp.float32(2.0) * jnp.cos(stepT))

    a = prep(gain_prev, phi_prev, step_prev)
    b = prep(gain_cur, phi_cur0, step_cur)

    def prep7(x):
        return jnp.pad(x.T, ((0, LI - 7), (0, 0)))

    a0 = prep7(interp_amp0)
    da = prep7(interp_damp)
    phi0 = prep7(interp_phi0)
    alpha = prep7(interp_alpha)
    q = prep7(interp_q)
    delta0 = alpha + q
    iv = (a0, da, jnp.cos(phi0), jnp.sin(phi0),
          jnp.cos(delta0), jnp.sin(delta0),
          jnp.cos(2.0 * q), jnp.sin(2.0 * q))

    in_spec = pl.BlockSpec((LP, cb), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    in_spec7 = pl.BlockSpec((LI, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((160, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    outp, outc, outi = pl.pallas_call(
        _kernel_old,
        interpret=interpret,
        grid=(c // cb,),
        in_specs=[in_spec] * 6 + [in_spec7] * 8,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((160, c), jnp.float32),
                   jax.ShapeDtypeStruct((160, c), jnp.float32),
                   jax.ShapeDtypeStruct((160, c), jnp.float32)),
    )(*a, *b, *iv)
    return (w_prev[None, :] * outp.T + w_cur[None, :] * outc.T + outi.T)


def main():
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    new = pv.voiced_sums
    fn_new, steps = ab_bench.build("imbe7200", channels)
    s0 = ab_bench.init_for("imbe7200", channels)
    jax.block_until_ready(fn_new(s0))          # compile NEW first

    pv.voiced_sums = voiced_sums_old           # then patch + compile OLD
    try:
        fn_old, _ = ab_bench.build("imbe7200", channels)
        jax.block_until_ready(fn_old(s0))
    finally:
        pv.voiced_sums = new

    # sanity: same math either side, so the consumed-PCM accumulators agree
    for a, b in zip(jax.tree.leaves(fn_new(s0)), jax.tree.leaves(fn_old(s0))):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 1e-5, f"A/B outputs diverge: rel {rel}"

    best_n = best_o = np.inf
    for _ in range(reps):
        for name, fn in (("new", fn_new), ("old", fn_old)):
            jax.block_until_ready(s0)
            t0 = time.time()
            jax.block_until_ready(fn(s0))
            dt = (time.time() - t0) / steps
            if name == "new":
                best_n = min(best_n, dt)
            else:
                best_o = min(best_o, dt)
    print(f"old 3-output: {best_o*1e3:.3f} ms/step  "
          f"new fused-window: {best_n*1e3:.3f} ms/step  "
          f"ratio old/new: {best_o/best_n:.3f}")


if __name__ == "__main__":
    main()
