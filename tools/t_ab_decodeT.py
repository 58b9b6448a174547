#!/usr/bin/env python3
# ARCHIVAL EVIDENCE (round-2/3): written against the pre-round-3
# channel-MAJOR layout; the measurements it documents are recorded in
# docs/PERFORMANCE.md. Not runnable on the channel-minor build.
"""A/B: row-major vs feature-major (transposed) IMBE param decode residual.

[C,72]/[C,57] elementwise chains use only 72/128 or 57/128 VPU lanes;
transposing to [72,C]/[57,C] puts channels on lanes (full occupancy) and
features on sublanes. Verifies bitwise equality first, then measures.
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
from mbe_tpu.models.state import Parms  # noqa: E402
from mbe_tpu.ops import bits as bit_ops  # noqa: E402
from mbe_tpu.tables import T  # noqa: E402
from tools.ab_bench import build, measure, ab  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402

orig_decode = imbe.decode_imbe4400_parms


def decode_T(imbe_d, cur: Parms, prev: Parms):
    """Feature-major variant of decode_imbe4400_parms; bitwise identical."""
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
    onehotT = (jnp.arange(48, dtype=jnp.int32)[:, None]
               == L9[None, :]).astype(jnp.float32)  # [48, C]

    def selT(table2d):  # [48, F] -> [F, C]
        return jnp.matmul(jnp.asarray(np.ascontiguousarray(table2d.T)),
                          onehotT, precision=hp,
                          preferred_element_type=jnp.float32)

    dT = d.T  # [88, C]
    colselT = selT(tb["colT"])   # [88, C]
    wselT = selT(tb["wT"])       # [88, C]
    pT = wselT * dT.astype(jnp.float32)

    colsF = jnp.arange(tb["NCOLS"], dtype=jnp.float32)[:, None]  # [72, 1]
    valsT = jnp.zeros((tb["NCOLS"], c), jnp.float32)
    for i in range(88):
        valsT = valsT + jnp.where(colselT[i:i + 1, :] == colsF,
                                  pT[i:i + 1, :], 0.0)

    # voicing
    li = jnp.arange(57, dtype=jnp.int32)[:, None]  # [57, 1]
    tl_idxT = jnp.clip(K[None, :] - 1 - (li - 1) // 3, 0, 11)  # [57, C]
    bb1T = valsT[:12]
    vl_fT = jnp.zeros((57, c), jnp.float32)
    for t in range(12):
        vl_fT = jnp.where(tl_idxT == t, bb1T[t:t + 1, :], vl_fT)
    vl_bits = vl_fT.T.astype(jnp.int32)  # [C, 57]
    lir = jnp.arange(57, dtype=jnp.int32)[None, :]
    band_mask = (lir >= 1) & (lir <= L[:, None])
    Vl = jnp.where(band_mask, vl_bits, cur.Vl)

    # gains
    b2 = valsT[12].astype(jnp.int32)  # [C]
    Gm1 = bit_ops.lut1d(b2, np.asarray(T.B2, np.float32))
    gain_stepT = selT(tb["gain_step"])  # [5, C]
    gain_offT = selT(tb["gain_off"])
    Gm_restT = gain_stepT * ((valsT[13:18] - gain_offT) + jnp.float32(0.5))
    GmT = jnp.concatenate([Gm1[None, :], Gm_restT], axis=0)  # [6, C]

    RiT = jnp.matmul(jnp.asarray(np.ascontiguousarray(tb["RiM"].T)), GmT,
                     precision=hp,
                     preferred_element_type=jnp.float32)  # [6, C]

    qfacT = selT(tb["hoc_qfac"])   # [54, C]
    offT = selT(tb["hoc_off"])
    validT = selT(tb["m_valid"].astype(np.float32)) > 0.5
    hocT = qfacT * ((valsT[18:72] - offT) + jnp.float32(0.5))
    hocT = jnp.where(validT, hocT, 0.0).reshape(6, 9, c)

    CikT = jnp.concatenate([RiT.reshape(6, 1, c), hocT], axis=1)  # [6,10,C]

    Ck = jnp.transpose(CikT, (1, 0, 2)).reshape(10, 6 * c)
    UT = jnp.matmul(jnp.asarray(np.ascontiguousarray(tb["Midct"].T)), Ck,
                    precision=hp,
                    preferred_element_type=jnp.float32)  # [110, 6C]
    UT = UT.reshape(11, 10, 6, c)
    jivarT = selT(tb["Ji"])  # [6, C]
    UselT = jnp.sum(
        jnp.where(jivarT[None, None, :, :]
                  == jnp.arange(11, dtype=jnp.float32)[:, None, None, None],
                  UT, 0.0), axis=0)  # [10, 6, C]
    slotsT = jnp.transpose(UselT, (1, 0, 2)).reshape(60, c)
    sclT = selT(tb["scl"])  # [57, C]
    TlT = jnp.zeros((57, c), jnp.float32)
    for s in range(60):
        TlT = jnp.where(sclT == jnp.float32(s), slotsT[s:s + 1, :], TlT)
    Tl = TlT.T

    rho = jnp.where(L <= 15, jnp.float32(0.4),
                    jnp.where(L <= 24,
                              jnp.float32(0.03) * L.astype(jnp.float32)
                              - jnp.float32(0.05),
                              jnp.float32(0.7)))
    Ml_n, log2_n, pM, pLg, cL = spectral.spectral_update(
        L, prev.L, prev.Ml, prev.log2Ml, Tl, weight=rho,
        cur_Ml=cur.Ml, cur_log2Ml=cur.log2Ml)

    ok = (bad == 0)
    okc = ok[:, None]
    cur_out = dataclasses.replace(
        cur,
        w0=jnp.where(ok, w0, cur.w0),
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


def check_equal(c=1024):
    rng = np.random.default_rng(0)
    d = rng.integers(0, 2, (c, 88), dtype=np.int32)
    s = st.init_state(c)
    # randomize prev state a bit
    prev = dataclasses.replace(
        s.prev,
        L=jnp.asarray(rng.integers(9, 57, c, dtype=np.int32)),
        Ml=jnp.asarray(rng.uniform(0, 2, (c, 57)).astype(np.float32)),
        log2Ml=jnp.asarray(rng.uniform(-2, 2, (c, 57)).astype(np.float32)))
    a = jax.jit(orig_decode)(d, s.cur, prev)
    b = jax.jit(decode_T)(d, s.cur, prev)
    for pa, pb, name in ((a[0], b[0], "cur"), (a[1], b[1], "prev")):
        for f in dataclasses.fields(pa):
            xa = np.asarray(getattr(pa, f.name))
            xb = np.asarray(getattr(pb, f.name))
            if not np.array_equal(xa, xb):
                bad = np.where(xa != xb)
                print(f"MISMATCH {name}.{f.name}: {len(bad[0])} diffs, "
                      f"max {np.abs(xa - xb).max()}")
                return False
    print("bitwise identical")
    return True


def main():
    check_equal()
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

    imbe.decode_imbe4400_parms = orig_decode
    fn_a, steps = build("imbe7200", channels)
    jax.block_until_ready(fn_a(st.init_state(channels)))

    imbe.decode_imbe4400_parms = decode_T
    fn_b, _ = build("imbe7200", channels)

    a, b = ab(fn_a, fn_b, channels, steps, rounds=4)
    print(f"imbe7200 C={channels}: row-major {a*1e3:.3f} ms  "
          f"feature-major {b*1e3:.3f} ms  ratio {a/b:.3f}x")


if __name__ == "__main__":
    main()
