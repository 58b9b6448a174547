#!/usr/bin/env python3
# ARCHIVAL EVIDENCE (round-2/3): written against the pre-round-3
# channel-MAJOR layout; the measurements it documents are recorded in
# docs/PERFORMANCE.md. Not runnable on the channel-minor build.
"""A/B: dense vs candidate-sparse IMBE param-decode select chains.

The three residual chains compare every lane against EVERY possible
target (88 bits x 72 columns, 57 bands x 60 slots, 57 bands x 12 bb1
bits), but across the 48 L-variants each bit/band only ever maps to a
small candidate set (1125 / 720 / 254 total pairs vs 6336 / 3420 / 684)
— ~5x less VPU chain work if the compares are restricted to the
candidates. Verifies bitwise equality, then measures in-process.
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
from tools.ab_bench import build, ab  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402

orig_decode = imbe.decode_imbe4400_parms


def _cand_tables():
    tb = imbe._decode_tables()
    colT = tb["colT"].astype(np.int32)
    # per-column candidate source bits
    bitcands = [[] for _ in range(72)]
    for i in range(88):
        for j in sorted(set(colT[:, i].tolist()) - {72}):
            bitcands[j].append(i)
    # per-band candidate slots
    scl = tb["scl"].astype(np.int32)
    slotcands = [sorted(set(scl[:, l].tolist()) - {-1}) for l in range(57)]
    # per-band candidate bb1 bit indices (over the K values b0 can produce)
    kvals = sorted(set(np.asarray(T.imbe_K_by_b0)[:208].tolist()))
    vlcands = [sorted({int(np.clip(k - 1 - (l - 1) // 3, 0, 11))
                       for k in kvals}) for l in range(57)]
    return tb, bitcands, slotcands, vlcands


def decode_sparse(imbe_d, cur: Parms, prev: Parms):
    """Candidate-sparse variant of decode_imbe4400_parms; bitwise equal."""
    tb, bitcands, slotcands, vlcands = _cand_tables()
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

    # candidate-sparse scatter-add: each column sums only the bits that
    # can reach it under some L
    cols_list = []
    for j in range(72):
        acc = jnp.zeros((c,), jnp.float32)
        jf = jnp.float32(j)
        for i in bitcands[j]:
            acc = acc + jnp.where(colsel[:, i] == jf, p[:, i], 0.0)
        cols_list.append(acc)
    vals = jnp.stack(cols_list, axis=-1)  # [C, 72]

    # voicing: per-band candidate bb1 bits
    bb1 = vals[:, :12]
    li = jnp.arange(57, dtype=jnp.int32)[None, :]
    tl_idx = jnp.clip(K[:, None] - 1 - (li - 1) // 3, 0, 11)
    vl_list = []
    for l in range(57):
        acc = jnp.zeros((c,), jnp.float32)
        for t in vlcands[l]:
            acc = acc + jnp.where(tl_idx[:, l] == t, bb1[:, t], 0.0)
        vl_list.append(acc)
    vl_bits = jnp.stack(vl_list, axis=-1).astype(jnp.int32)
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

    qfac = imbe._onehot_select(onehot, tb["hoc_qfac"], (54,))
    off = imbe._onehot_select(onehot, tb["hoc_off"], (54,))
    valid = imbe._onehot_select(
        onehot, tb["m_valid"].astype(np.float32), (54,)) > 0.5
    hoc = qfac * ((vals[:, 18:72] - off) + jnp.float32(0.5))
    hoc = jnp.where(valid, hoc, 0.0).reshape(c, 6, 9)

    Cik = jnp.concatenate([Ri[..., None], hoc], axis=-1).reshape(c, 60)

    U = jnp.matmul(Cik.reshape(c * 6, 10), jnp.asarray(tb["Midct"]),
                   precision=hp,
                   preferred_element_type=jnp.float32)
    U = U.reshape(c, 6, 11, 10)
    jivar = jnp.matmul(onehot, jnp.asarray(tb["Ji"]), precision=hp,
                       preferred_element_type=jnp.float32)
    Usel = jnp.sum(
        jnp.where(jivar[:, :, None, None]
                  == jnp.arange(11, dtype=jnp.float32)[None, None, :, None],
                  U, 0.0), axis=2).reshape(c, 60)
    scl = jnp.matmul(onehot, jnp.asarray(tb["scl"]), precision=hp,
                     preferred_element_type=jnp.float32)

    # candidate-sparse slot->band select
    tl_list = []
    for l in range(57):
        acc = jnp.zeros((c,), jnp.float32)
        for s in slotcands[l]:
            acc = acc + jnp.where(scl[:, l] == jnp.float32(s),
                                  Usel[:, s], 0.0)
        tl_list.append(acc)
    Tl = jnp.stack(tl_list, axis=-1)

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
    prev = dataclasses.replace(
        s.prev,
        L=jnp.asarray(rng.integers(9, 57, c, dtype=np.int32)),
        Ml=jnp.asarray(rng.uniform(0, 2, (c, 57)).astype(np.float32)),
        log2Ml=jnp.asarray(rng.uniform(-2, 2, (c, 57)).astype(np.float32)))
    a = jax.jit(orig_decode)(d, s.cur, prev)
    b = jax.jit(decode_sparse)(d, s.cur, prev)
    okall = True
    for pa, pb, name in ((a[0], b[0], "cur"), (a[1], b[1], "prev")):
        for f in dataclasses.fields(pa):
            xa = np.asarray(getattr(pa, f.name))
            xb = np.asarray(getattr(pb, f.name))
            if not np.array_equal(xa, xb):
                nbad = int((xa != xb).sum())
                print(f"MISMATCH {name}.{f.name}: {nbad} diffs")
                okall = False
    print("bitwise identical" if okall else "NOT EQUAL")
    return okall


def main():
    assert check_equal()
    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

    imbe.decode_imbe4400_parms = orig_decode
    fn_a, steps = build("imbe7200", channels)
    jax.block_until_ready(fn_a(st.init_state(channels)))

    imbe.decode_imbe4400_parms = decode_sparse
    fn_b, _ = build("imbe7200", channels)

    a, b = ab(fn_a, fn_b, channels, steps, rounds=4)
    print(f"imbe7200 C={channels}: dense {a*1e3:.3f} ms  "
          f"sparse {b*1e3:.3f} ms  ratio {a/b:.3f}x")


if __name__ == "__main__":
    main()
