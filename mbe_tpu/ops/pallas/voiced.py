"""Pallas TPU kernel: voiced oscillator bank via Chebyshev recurrence.

The XLA path evaluates cos(phi + n*step) over dense [C, 56, 160] grids —
~18k transcendentals per channel-frame and the step's single largest cost
(ablation: ~35% of the honest full step). This kernel generates the same
cosines with the three-term Chebyshev recurrence

    t[n+1] = 2*cos(step) * t[n] - t[n-1],    t[n] = g * cos(phi + n*step)

which needs no sine state and one FMA + one subtract per harmonic-sample
(the reference uses a 2x2 rotation recurrence instead,
mbe_fill_voiced_cos_block4 at mbelib.c:208-223 — 4 mul + 2 add; on the VPU
the Chebyshev form measured 1.9x faster standalone, 1.11x end-to-end).
The recurrence's error response to a step-k perturbation is
sin((n-k)s)/sin(s), so drift is bounded by ~160*eps/sin(s) — ~90 dB
agreement with direct evaluation for every w0*l the codecs produce,
comfortably inside the >=60 dB synthesis budget.

The gains are folded into the oscillator state (t starts at g*cos(phi);
the recurrence is linear, so amplitude rides along) — no per-sample gain
multiply. Eight samples are emitted per loop iteration so each store is a
full aligned [8, CB] tile instead of a [1, CB] row (160 row stores -> 20
tile stores; measured 1.9x standalone vs the row-store rotation kernel).

Layout: harmonics on sublanes (56 -> pad 64), channels on lanes (blocks of
128 — cb=256/512 measured slower). Outputs are the per-n harmonic sums for
the prev/cur components ([160, CB] each); the caller applies the synthesis
windows (the window does not depend on l, so it factors out of the sum —
same reordering the XLA path uses).

The interpolated path (JMBE #134-138, mbelib.c:953-968 — quadratic phase
theta_n = phi + alpha*n + q*n^2 with a linear amplitude lerp, harmonics
l<8 only) runs as a third in-kernel component on one [8, CB] sublane tile:
a double rotor (the oscillator rotates by delta_n, the delta rotor by the
constant 2q) plus one amplitude add per sample. Its XLA form ([C,7,160]
cos grids) ablated at ~1 ms/step at C=32768; in-kernel it costs ~0.2 ms
and the grids disappear (measured 1.11x end-to-end).

Round-4 reduce attack (tools/t_voiced4.py / t_voiced4b.py, C=32768, one
process each, 2026-08-19): production fori_loop kernel 1.404 ms,
no-reduce floor 0.842 ms — the three per-sample jnp.sums were ~40% of
the kernel. Three stacked changes, all adopted:
  1. Full Python unroll of the 20-iteration loop (1.161 vs 1.404 ms —
     Mosaic scalar-loop overhead was real).
  2. LP 64 -> 56: the harmonic tiles carry no zero pad sublanes
     (56 = 7 f32 vregs exactly), 12.5% fewer recurrence + fold ops.
  3. Merged collapse: fold each [56, CB] component to one [8, CB]
     partial (6 vreg adds), apply the per-sample window SCALARS to the
     partials, add the interp [8, CB] product, then ONE 8-sublane
     column sum per sample instead of three full jnp.sums
     (1.100 ms total; ~1.28x the round-3 kernel, ~5% end-to-end).
The merged collapse reassociates the float sum (window multiplied
before the final 8-sublane fold): 1.6e-7 relative vs the round-3
kernel, far inside the >=60 dB synthesis budget.

Measured negatives (do not re-try): stride-8 interleaved oscillator chains
(2.7x slower); merging prev/cur into one [128, CB] tile; explicit pairwise
tree reduce for the emit sum (Mosaic already emits a tree for jnp.sum);
wider channel blocks (cb=256 re-checked round 4: 1.393 vs 1.404 loop /
1.126 vs 1.133 unrolled — noise); offloading the harmonic sums to the MXU
via a [136, 8*cb] scratch + block-row-sum matrix (1.636 ms AND 1.6e-3
error from bf16-class passes — t_voiced4.py `mxu`).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 128   # channels per grid step (lane dimension)
LP = 56    # harmonic sublanes (7 f32 vregs exactly — no pad rows)
LI = 8     # interpolated harmonics (7) padded to one sublane tile


def _make_kernel(unroll: bool):
    """Kernel body; `unroll=True` Python-unrolls the 20-iteration outer
    loop (the Mosaic-compiled production form — 1.161 vs 1.231 ms at
    C=32768). Interpret mode keeps the fori_loop: the fully unrolled body
    makes the interpret-mode XLA CPU graph explode (>25 min / >50 GB to
    compile on the 1-core CI host). The per-sample math is identical."""

    def kernel(y0p_ref, y1p_ref, c2p_ref,
               y0c_ref, y1c_ref, c2c_ref,
               a0_ref, da_ref, oc_ref, os_ref, dc_ref, ds_ref,
               r2c_ref, r2s_ref, wp_ref, wc_ref,
               out_ref):
        c2p = c2p_ref[...]
        c2c = c2c_ref[...]
        r2c = r2c_ref[...]
        r2s = r2s_ref[...]
        da = da_ref[...]

        def fold8(y):  # [56, CB] -> [8, CB] partial sums (6 vreg adds)
            acc = y[0:8, :]
            for v in range(1, LP // 8):
                acc = acc + y[8 * v:8 * (v + 1), :]
            return acc

        # interpolated path (JMBE #134-138, mbelib.c:953-968): quadratic
        # phase theta_n = phi + alpha*n + q*n^2 via a double rotor — the
        # oscillator rotates by delta_n = alpha + q*(2n+1), and the delta
        # rotor itself rotates by the constant 2q. Amplitude is the linear
        # lerp a0 + n*da, one add per sample.
        def body(n, carry):
            y0p, y1p, y0c, y1c, (a, oc, osn, dc, dsn) = carry
            rows = []
            for k in range(8):
                # window the [8, CB] partials, add the interp products,
                # ONE 8-sublane collapse (same w*sum + w*sum + interp
                # value as the old three-reduce epilogue, reassociated)
                w = (wp_ref[pl.ds(n * 8 + k, 1), :] * fold8(y0p)
                     + wc_ref[pl.ds(n * 8 + k, 1), :] * fold8(y0c)
                     + a * oc)
                rows.append(jnp.sum(w, axis=0, keepdims=True))
                y0p, y1p = y1p, c2p * y1p - y0p
                y0c, y1c = y1c, c2c * y1c - y0c
                oc, osn = oc * dc - osn * dsn, osn * dc + oc * dsn
                dc, dsn = dc * r2c - dsn * r2s, dsn * r2c + dc * r2s
                a = a + da
            out_ref[pl.ds(n * 8, 8), :] = jnp.concatenate(rows, axis=0)
            return y0p, y1p, y0c, y1c, (a, oc, osn, dc, dsn)

        init = (y0p_ref[...], y1p_ref[...], y0c_ref[...], y1c_ref[...],
                (a0_ref[...], oc_ref[...], os_ref[...],
                 dc_ref[...], ds_ref[...]))
        if unroll:
            carry = init
            for n in range(20):
                carry = body(n, carry)
        else:
            jax.lax.fori_loop(0, 20, body, init)

    return kernel


_kernel = _make_kernel(unroll=True)
_kernel_loop = _make_kernel(unroll=False)


def voiced_sums(gain_prev, phi_prev, step_prev, gain_cur, phi_cur0, step_cur,
                interp_amp0, interp_damp, interp_phi0, interp_alpha,
                interp_q, w_prev, w_cur, interpret=False, cb=CB):
    """Windowed voiced component: all three harmonic sums + windows fused.

    Args (first six [56, C] f32, interp_* [7, C] f32 — channel-minor, the
    kernel's native layout; C a multiple of cb):
      gain_prev/gain_cur: 2*Ml with all masks folded in (zero = inactive).
      phi_prev: prev_PHIl; phi_cur0: cur_PHIl - cw0*l*160 (start phase).
      step_prev/step_cur: w0*l phase increments.
      interp_amp0/interp_damp: start amplitude and per-sample increment of
        the interpolated path's linear amplitude lerp (gate folded in).
      interp_phi0/interp_alpha/interp_q: quadratic phase
        theta_n = phi0 + alpha*n + q*n^2 (mbelib.c:953-968).
      w_prev/w_cur: [160] f32 per-sample synthesis windows (Ws[n+160],
        Ws[n]) applied in-kernel — the window is l-independent so it rides
        on the summed row, and folding it here cuts the kernel's HBM
        output (and the caller's transposes) from three [160, C] arrays
        to one.
      cb: channels per grid block (128 is the measured optimum).
    Returns:
      voiced [160, C]:
      voiced[n, c] = w_prev[n] * sum_l gain_prev*cos(phi_prev + n*step_prev)
                   + w_cur[n]  * sum_l gain_cur *cos(phi_cur0 + n*step_cur)
                   + sum_l amp_n * cos(theta_n).
    """
    c = gain_prev.shape[1]

    def prep(g, phi, step):
        # fold gains into the oscillator state (inputs arrive [56, C] —
        # the channel-minor state layout matches the kernel layout, and
        # since round 4 LP == 56, no pad rows either)
        return (g * jnp.cos(phi), g * jnp.cos(phi + step),
                jnp.float32(2.0) * jnp.cos(step))

    a = prep(gain_prev, phi_prev, step_prev)
    b = prep(gain_cur, phi_cur0, step_cur)

    def prep7(x):
        return jnp.pad(x, ((0, LI - 7), (0, 0)))

    a0 = prep7(interp_amp0)
    da = prep7(interp_damp)
    phi0 = prep7(interp_phi0)
    alpha = prep7(interp_alpha)
    q = prep7(interp_q)
    delta0 = alpha + q          # theta_{n+1} - theta_n at n=0
    iv = (a0, da, jnp.cos(phi0), jnp.sin(phi0),
          jnp.cos(delta0), jnp.sin(delta0),
          jnp.cos(2.0 * q), jnp.sin(2.0 * q))

    # [160, cb] broadcast window tiles, same block for every grid step
    wp = jnp.broadcast_to(jnp.asarray(w_prev, jnp.float32)[:, None],
                          (160, cb))
    wc = jnp.broadcast_to(jnp.asarray(w_cur, jnp.float32)[:, None],
                          (160, cb))

    in_spec = pl.BlockSpec((LP, cb), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_spec7 = pl.BlockSpec((LI, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((160, cb), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((160, cb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_loop if interpret else _kernel,
        interpret=interpret,
        grid=(c // cb,),
        in_specs=[in_spec] * 6 + [in_spec7] * 8 + [w_spec, w_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((160, c), jnp.float32),
    )(*a, *b, *iv, wp, wc)
    return out
