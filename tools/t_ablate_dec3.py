#!/usr/bin/env python3
"""Round-3 micro-ablation INSIDE decode_imbe4400_parms (channel-minor).

Clones the shipped decode with one named sub-stage replaced by a cheap
input-dependent stand-in, monkeypatches it into the full jitted step, and
diffs the honest step time (tools/ab_bench helpers; base re-measured per
stage to ride out tunnel drift). Sub-stages:

  b0lut     b0 pack + lut1d(w0/L/K) + onehot build
  scatter   colsel/wsel matmuls + sparse 1125-pair scatter-add
  voicing   sparse 245-pair Vl select
  gains     B2 lut + gain matmuls + Ri IDCT + HOC matmuls
  blockidct Mlo/Mhi build + 10-step Usel accumulation
  tlsel     scl matmul + sparse 720-pair Tl select
  (spectral_update is measured by tools/ablate.py separately)

Usage: python tools/t_ablate_dec3.py [channels] [steps]
"""

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
from mbe_tpu.ops import bits as bit_ops  # noqa: E402
from mbe_tpu.tables import T  # noqa: E402
from tools.ab_bench import build, init_for, measure  # noqa: E402

orig = imbe.decode_imbe4400_parms


def make_decode(stub):
    def decode(imbe_d, cur, prev):
        tb = imbe._decode_tables()
        dT = imbe_d.astype(jnp.float32)  # [88, C]
        c = dT.shape[1]
        hp = jax.lax.Precision.HIGHEST

        if stub == "b0lut":
            b0 = jnp.sum(dT[:8].astype(jnp.int32), axis=0)
            bad = (b0 > 207).astype(jnp.int32)
            b0s = jnp.clip(b0, 0, 207)
            w0 = b0s.astype(jnp.float32) * jnp.float32(0.001)
            L = jnp.clip(b0s, 9, 56)
            K = jnp.clip(b0s % 12, 3, 12)
        else:
            wts = jnp.asarray(
                (1 << np.arange(len(imbe._B0_IDX) - 1, -1, -1)
                 ).astype(np.int32))
            b0 = jnp.sum(dT[jnp.asarray(imbe._B0_IDX), :].astype(jnp.int32)
                         * wts[:, None], axis=0)
            bad = (b0 > 207).astype(jnp.int32)
            b0s = jnp.clip(b0, 0, 207)
            w0 = bit_ops.lut1d(b0s, np.asarray(T.imbe_w0_by_b0, np.float32))
            L = bit_ops.lut1d(b0s, np.asarray(T.imbe_L_by_b0, np.int32))
            K = bit_ops.lut1d(b0s, np.asarray(T.imbe_K_by_b0, np.int32))
        L9 = L - 9
        onehotT = (L9[None, :] == jnp.arange(48, dtype=jnp.int32)[:, None]
                   ).astype(jnp.float32)  # [48, C]

        onehot_bf = onehotT.astype(jnp.bfloat16)
        if stub == "scatter":
            vals = jnp.broadcast_to(dT[:72], (72, c))
        else:
            colsel = jnp.matmul(jnp.asarray(tb["colT"], jnp.bfloat16).T,
                                onehot_bf,
                                preferred_element_type=jnp.float32)
            wsel = jnp.matmul(jnp.asarray(tb["wT"], jnp.bfloat16).T,
                              onehot_bf, preferred_element_type=jnp.float32)
            p = wsel * dT
            rows = []
            for col, ii in enumerate(tb["col_bits"]):
                idx = jnp.asarray(np.asarray(ii, np.int32))
                sel = jnp.where(colsel[idx, :] == jnp.float32(col),
                                p[idx, :], 0.0)
                rows.append(jnp.sum(sel, axis=0, keepdims=True))
            vals = jnp.concatenate(rows, axis=0)  # [72, C]

        li = jnp.arange(57, dtype=jnp.int32)[:, None]
        tl_idx = jnp.clip(K[None, :] - 1 - (li - 1) // 3, 0, 11)
        bb1 = vals[:12]
        if stub == "voicing":
            vl_f = jnp.broadcast_to(bb1[:1], (57, c))
        else:
            vl_rows = [jnp.zeros((1, c), jnp.float32)]
            for l in range(1, 57):
                row = jnp.zeros((1, c), jnp.float32)
                for t in tb["band_ts"][l]:
                    row = jnp.where(tl_idx[l:l + 1, :] == t,
                                    bb1[t:t + 1, :], row)
                vl_rows.append(row)
            vl_f = jnp.concatenate(vl_rows, axis=0)
        vl_bits = vl_f.astype(jnp.int32)
        band_mask = (li >= 1) & (li <= L[None, :])
        Vl = jnp.where(band_mask, vl_bits, cur.Vl)

        if stub == "gains":
            Cik = jnp.broadcast_to(vals[:60].reshape(6, 10, c), (6, 10, c))
        else:
            b2 = vals[12].astype(jnp.int32)
            Gm1 = bit_ops.lut1d(b2, np.asarray(T.B2, np.float32))
            gain_step = jnp.matmul(jnp.asarray(tb["gain_step"]).T, onehotT,
                                   precision=hp,
                                   preferred_element_type=jnp.float32)
            gain_off = jnp.matmul(jnp.asarray(tb["gain_off"]).T, onehotT,
                                  precision=hp,
                                  preferred_element_type=jnp.float32)
            Gm_rest = gain_step * ((vals[13:18] - gain_off)
                                   + jnp.float32(0.5))
            Gm = jnp.concatenate([Gm1[None, :], Gm_rest], axis=0)
            Ri = jnp.matmul(jnp.asarray(tb["RiM"]).T, Gm, precision=hp,
                            preferred_element_type=jnp.float32)
            qfac = jnp.matmul(jnp.asarray(tb["hoc_qfac"]).T, onehotT,
                              precision=hp,
                              preferred_element_type=jnp.float32)
            off = jnp.matmul(jnp.asarray(tb["hoc_off"]).T, onehotT,
                             precision=hp, preferred_element_type=jnp.float32)
            valid = jnp.matmul(jnp.asarray(tb["m_valid"].astype(np.float32)
                                           ).T, onehotT, precision=hp,
                               preferred_element_type=jnp.float32) > 0.5
            hoc = qfac * ((vals[18:72] - off) + jnp.float32(0.5))
            hoc = jnp.where(valid, hoc, 0.0).reshape(6, 9, c)
            Cik = jnp.concatenate([Ri.reshape(6, 1, c), hoc], axis=1)

        if stub == "blockidct":
            Usel = jnp.broadcast_to(Cik.reshape(60, c), (60, c))
        else:
            M3 = np.asarray(tb["Midct"]).reshape(10, 11, 10)
            M100 = np.ascontiguousarray(
                M3.transpose(1, 0, 2).reshape(11, 100))
            lo = jnp.floor_divide(L, 6)
            lof = lo.astype(jnp.float32)[None, :]
            nlo = (6 - (L - 6 * lo))[None, :]
            ehi = jnp.arange(6, dtype=jnp.int32)[:, None] >= nlo
            Mlo = jnp.zeros((100, c), jnp.float32)
            Mhi = jnp.zeros((100, c), jnp.float32)
            for v in range(1, 10):
                mv = lof == jnp.float32(v)
                Mlo = jnp.where(mv, jnp.asarray(M100[v])[:, None], Mlo)
                Mhi = jnp.where(mv, jnp.asarray(M100[v + 1])[:, None], Mhi)
            ehx = ehi[:, None, :]
            Usel = jnp.zeros((6, 10, c), jnp.float32)
            for k in range(10):
                wk = jnp.where(ehx, Mhi[10 * k:10 * k + 10][None, :, :],
                               Mlo[10 * k:10 * k + 10][None, :, :])
                Usel = Usel + Cik[:, k, :][:, None, :] * wk
            Usel = Usel.reshape(60, c)

        if stub == "tlsel":
            Tl = jnp.broadcast_to(Usel[:1], (57, c))
        else:
            scl = jnp.matmul(jnp.asarray(tb["scl"], jnp.bfloat16).T,
                             onehotT.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            tl_rows = [jnp.zeros((1, c), jnp.float32)]
            for l in range(1, 57):
                row = jnp.zeros((1, c), jnp.float32)
                for sl in tb["band_slots"][l]:
                    row = jnp.where(scl[l:l + 1, :] == jnp.float32(sl),
                                    Usel[sl:sl + 1, :], row)
                tl_rows.append(row)
            Tl = jnp.concatenate(tl_rows, axis=0)

        rho = jnp.where(L <= 15, jnp.float32(0.4),
                        jnp.where(L <= 24,
                                  jnp.float32(0.03) * L.astype(jnp.float32)
                                  - jnp.float32(0.05),
                                  jnp.float32(0.7)))
        Ml_n, log2_n, pM, pLg, cL = spectral.spectral_update(
            L, prev.L, prev.Ml, prev.log2Ml, Tl, weight=rho,
            cur_Ml=cur.Ml, cur_log2Ml=cur.log2Ml)

        ok = (bad == 0)
        okc = ok[None, :]
        cur_out = dataclasses.replace(
            cur,
            w0=jnp.where(ok, w0.astype(jnp.float32), cur.w0),
            L=jnp.where(ok, cL, cur.L),
            K=jnp.where(ok, K, cur.K),
            Vl=jnp.where(okc, Vl, cur.Vl),
            Ml=jnp.where(okc, Ml_n, cur.Ml),
            log2Ml=jnp.where(okc, log2_n, cur.log2Ml))
        prev_out = dataclasses.replace(
            prev,
            Ml=jnp.where(okc, pM, prev.Ml),
            log2Ml=jnp.where(okc, pLg, prev.log2Ml))
        return cur_out, prev_out, bad
    return decode


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    # sanity: the no-stub clone must be bit-identical to the shipped decode
    imbe.decode_imbe4400_parms = make_decode("none")
    fn_clone, st_steps = build("imbe7200", C)
    out_clone = jax.block_until_ready(fn_clone(init_for("imbe7200", C)))
    imbe.decode_imbe4400_parms = orig
    fn_base, _ = build("imbe7200", C)
    out_base = jax.block_until_ready(fn_base(init_for("imbe7200", C)))
    same = jnp.allclose(out_clone[1], out_base[1], atol=0, rtol=0)
    print(f"clone bit-identical to shipped decode: {bool(same)}", flush=True)

    base = measure(fn_base, C, st_steps, codec="imbe7200")
    print(f"BASE: {base*1e3:.3f} ms/step", flush=True)

    for stub in ["b0lut", "scatter", "voicing", "gains", "blockidct",
                 "tlsel"]:
        imbe.decode_imbe4400_parms = make_decode(stub)
        fn_s, _ = build("imbe7200", C)
        jax.block_until_ready(fn_s(init_for("imbe7200", C)))
        imbe.decode_imbe4400_parms = orig
        t_s = measure(fn_s, C, st_steps, codec="imbe7200")
        t_b = measure(fn_base, C, st_steps, codec="imbe7200")
        print(f"  -{stub:10s}: {t_s*1e3:.3f} ms/step  "
              f"saves {(t_b-t_s)*1e3:+.3f} ms ({(t_b-t_s)/t_b*100:5.1f}%)  "
              f"[base now {t_b*1e3:.3f}]", flush=True)


if __name__ == "__main__":
    main()
