#!/usr/bin/env python3
# ARCHIVAL EVIDENCE (round-2/3): written against the pre-round-3
# channel-MAJOR layout; the measurements it documents are recorded in
# docs/PERFORMANCE.md. Not runnable on the channel-minor build.
"""Micro-ablation INSIDE decode_imbe4400_parms: stub one sub-stage at a
time (input-dependent stand-ins) inside the full jitted step and diff."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import dataclasses  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mbe_tpu.models import imbe, spectral  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402
from mbe_tpu.ops import bits as bit_ops  # noqa: E402
from mbe_tpu.tables import T  # noqa: E402
from tools.ab_bench import build, measure  # noqa: E402

orig = imbe.decode_imbe4400_parms


def make_decode(stub):
    """decode_imbe4400_parms with a named sub-stage stubbed."""
    def decode(imbe_d, cur, prev):
        tb = imbe._decode_tables()
        d = imbe_d.astype(jnp.int32)
        c = d.shape[0]
        hp = jax.lax.Precision.HIGHEST

        b0 = bit_ops.pack_msb_first(d, imbe._B0_IDX)
        bad = (b0 > 207).astype(jnp.int32)
        b0s = jnp.clip(b0, 0, 207)
        w0 = bit_ops.lut1d(b0s, np.asarray(T.imbe_w0_by_b0, np.float32))
        L = bit_ops.lut1d(b0s, np.asarray(T.imbe_L_by_b0, np.int32))
        K = bit_ops.lut1d(b0s, np.asarray(T.imbe_K_by_b0, np.int32))
        L9 = L - 9
        onehot = jax.nn.one_hot(L9, 48, dtype=jnp.float32)

        df = d.astype(jnp.float32)
        colsel = jnp.matmul(onehot, jnp.asarray(tb["colT"]), precision=hp,
                            preferred_element_type=jnp.float32)
        wsel = jnp.matmul(onehot, jnp.asarray(tb["wT"]), precision=hp,
                          preferred_element_type=jnp.float32)
        p = wsel * df
        if stub == "scatter":
            vals = jnp.broadcast_to(p[:, :1], (c, tb["NCOLS"]))
        else:
            cols = jnp.arange(tb["NCOLS"], dtype=jnp.float32)[None, :]
            vals = jnp.zeros((c, tb["NCOLS"]), jnp.float32)
            for i in range(88):
                vals = vals + jnp.where(colsel[:, i:i + 1] == cols,
                                        p[:, i:i + 1], 0.0)

        li = jnp.arange(57, dtype=jnp.int32)[None, :]
        tl_idx = jnp.clip(K[:, None] - 1 - (li - 1) // 3, 0, 11)
        bb1 = vals[:, :12]
        if stub == "vlchain":
            vl_f = jnp.broadcast_to(bb1[:, :1], (c, 57))
        else:
            vl_f = jnp.zeros((c, 57), jnp.float32)
            for t in range(12):
                vl_f = jnp.where(tl_idx == t, bb1[:, t:t + 1], vl_f)
        vl_bits = vl_f.astype(jnp.int32)
        band_mask = (li >= 1) & (li <= L[:, None])
        Vl = jnp.where(band_mask, vl_bits, cur.Vl)

        b2 = vals[:, 12].astype(jnp.int32)
        Gm1 = bit_ops.lut1d(b2, np.asarray(T.B2, np.float32))
        gain_step = imbe._onehot_select(onehot, tb["gain_step"], (5,))
        gain_off = imbe._onehot_select(onehot, tb["gain_off"], (5,))
        Gm_rest = gain_step * ((vals[:, 13:18] - gain_off) + jnp.float32(0.5))
        Gm = jnp.concatenate([Gm1[:, None], Gm_rest], axis=-1)
        Ri = jnp.matmul(Gm, jnp.asarray(tb["RiM"]), precision=hp,
                        preferred_element_type=jnp.float32)

        if stub == "hoc":
            hoc = jnp.broadcast_to(vals[:, 18:19, None], (c, 6, 9))
        else:
            qfac = imbe._onehot_select(onehot, tb["hoc_qfac"], (54,))
            off = imbe._onehot_select(onehot, tb["hoc_off"], (54,))
            valid = imbe._onehot_select(
                onehot, tb["m_valid"].astype(np.float32), (54,)) > 0.5
            hoc = qfac * ((vals[:, 18:72] - off) + jnp.float32(0.5))
            hoc = jnp.where(valid, hoc, 0.0).reshape(c, 6, 9)
        Cik = jnp.concatenate([Ri[..., None], hoc], axis=-1).reshape(c, 60)

        if stub == "tl":
            Tl = jnp.broadcast_to(Cik[:, :1], (c, 57))
        else:
            U = jnp.matmul(Cik.reshape(c * 6, 10), jnp.asarray(tb["Midct"]),
                           precision=hp, preferred_element_type=jnp.float32)
            U = U.reshape(c, 6, 11, 10)
            jivar = jnp.matmul(onehot, jnp.asarray(tb["Ji"]), precision=hp,
                               preferred_element_type=jnp.float32)
            Usel = jnp.sum(
                jnp.where(jivar[:, :, None, None]
                          == jnp.arange(11,
                                        dtype=jnp.float32)[None, None, :, None],
                          U, 0.0), axis=2).reshape(c, 60)
            scl = jnp.matmul(onehot, jnp.asarray(tb["scl"]), precision=hp,
                             preferred_element_type=jnp.float32)
            Tl = jnp.zeros((c, 57), jnp.float32)
            for s in range(60):
                Tl = jnp.where(scl == jnp.float32(s), Usel[:, s:s + 1], Tl)

        rho = jnp.where(L <= 15, jnp.float32(0.4),
                        jnp.where(L <= 24,
                                  jnp.float32(0.03) * L.astype(jnp.float32)
                                  - jnp.float32(0.05), jnp.float32(0.7)))
        if stub == "spectral":
            Ml_n, log2_n, pM, pLg, cL = (cur.Ml + Tl, cur.log2Ml, prev.Ml,
                                         prev.log2Ml, jnp.clip(L, 1, 56))
        else:
            Ml_n, log2_n, pM, pLg, cL = spectral.spectral_update(
                L, prev.L, prev.Ml, prev.log2Ml, Tl, weight=rho,
                cur_Ml=cur.Ml, cur_log2Ml=cur.log2Ml)

        ok = (bad == 0)
        okc = ok[:, None]
        cur_out = dataclasses.replace(
            cur, w0=jnp.where(ok, w0, cur.w0), L=jnp.where(ok, cL, cur.L),
            K=jnp.where(ok, K, cur.K), Vl=jnp.where(okc, Vl, cur.Vl),
            Ml=jnp.where(okc, Ml_n, cur.Ml),
            log2Ml=jnp.where(okc, log2_n, cur.log2Ml))
        prev_out = dataclasses.replace(
            prev, Ml=jnp.where(okc, pM, prev.Ml),
            log2Ml=jnp.where(okc, pLg, prev.log2Ml))
        return cur_out, prev_out, bad
    return decode


def main():
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    steps = 50

    imbe.decode_imbe4400_parms = make_decode(None)
    base_fn, _ = build("imbe7200", channels)
    t_base = measure(base_fn, channels, steps)
    print(f"BASE (inline decode): {t_base*1e3:.3f} ms/step", flush=True)

    for stub in ("scatter", "vlchain", "hoc", "tl", "spectral"):
        imbe.decode_imbe4400_parms = make_decode(stub)
        fn, _ = build("imbe7200", channels)
        t = measure(fn, channels, steps)
        imbe.decode_imbe4400_parms = make_decode(None)
        t2 = measure(base_fn, channels, steps)
        ref = min(t_base, t2)
        print(f"  -{stub:10s}: {t*1e3:7.3f} ms  saves {(ref-t)*1e3:6.3f} ms "
              f"[base now {t2*1e3:.3f}]", flush=True)

    imbe.decode_imbe4400_parms = orig


if __name__ == "__main__":
    main()
