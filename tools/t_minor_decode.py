"""Channel-minor ([..., C]) prototype of the IMBE param-decode chain.

Hypothesis (round 3): every [C,57]/[C,72]/[C,88] array pads its minor dim
to 128 lanes on TPU (44-56% occupancy), so the VPU-bound decode/spectral
chains waste ~half their lanes. This clones decode_imbe4400_parms +
spectral_update with the channel axis minor ([57,C] etc.) and A/Bs the two
inside one process:

  python tools/t_minor_decode.py check          # CPU bit-exactness, C=256
  python tools/t_minor_decode.py ab [C] [steps] # TPU same-process A/B

Both sides consume their outputs via sums inside a device-side scan.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mbe_tpu.models import imbe, spectral  # noqa: E402
from mbe_tpu.models.state import Parms  # noqa: E402
from mbe_tpu.ops import bits as bit_ops  # noqa: E402
from mbe_tpu.tables import T  # noqa: E402

HP = jax.lax.Precision.HIGHEST
_B0_IDX = np.array([0, 1, 2, 3, 4, 5, 85, 86], np.int32)


# --- channel-minor clones ----------------------------------------------------

def _permute_m(src, *arrays):
    """out[l, c] = arr[src[l, c], c] (channel-minor _permute)."""
    outs = [jnp.zeros_like(a) for a in arrays]
    for m in range(57):
        eq = src == m
        outs = [jnp.where(eq, a[m:m + 1, :], o)
                for a, o in zip(arrays, outs)]
    return outs


def _row_at_m(idx, arr):
    eq = jnp.arange(57, dtype=jnp.int32)[:, None] == idx[None, :]
    return jnp.sum(jnp.where(eq, arr, 0.0), axis=0)


def extend_prev_m(prev_Ml, prev_log2Ml, cur_L, prev_L):
    idx = jnp.arange(57, dtype=jnp.int32)[:, None]
    ext = ((cur_L > prev_L)[None, :] & (idx > prev_L[None, :])
           & (idx <= cur_L[None, :]))

    def one(a):
        at_L = _row_at_m(prev_L, a)[None, :]
        out = jnp.where(ext, at_L, a)
        return jnp.where(idx == 0, a[1:2, :], out)

    return one(prev_Ml), one(prev_log2Ml)


def spectral_update_m(cur_L, prev_L, prev_Ml, prev_log2Ml, Tl, *, weight,
                      cur_Ml, cur_log2Ml):
    cL = jnp.clip(cur_L, 1, 56)
    pL = jnp.clip(prev_L, 1, 56)
    pM, pLg = extend_prev_m(prev_Ml, prev_log2Ml, cL, pL)

    lf = jnp.arange(57, dtype=jnp.float32)[:, None]
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    mask = (li >= 1) & (li <= cL[None, :])
    flokl = (pL.astype(jnp.float32) / cL.astype(jnp.float32))[None, :] * lf
    intkl = jnp.clip(flokl.astype(jnp.int32), 0, 56)
    deltal = flokl - intkl.astype(jnp.float32)
    upper = jnp.minimum(intkl + 1, 56)

    lg_lo = _permute_m(intkl, pLg)[0]
    lg_hi = _permute_m(upper, pLg)[0]
    interp = (1.0 - deltal) * lg_lo + deltal * lg_hi
    ssum = jnp.sum(jnp.where(mask, interp, 0.0), axis=0)
    wsum = (weight / cL.astype(jnp.float32)) * ssum

    w = weight[None, :]
    log2Ml = Tl + w * (1.0 - deltal) * lg_lo + w * deltal * lg_hi \
        - wsum[None, :]
    Ml = jnp.exp2(log2Ml)
    cur_Ml_out = jnp.where(mask, Ml, cur_Ml)
    cur_log2_out = jnp.where(mask, log2Ml, cur_log2Ml)
    return cur_Ml_out, cur_log2_out, pM, pLg, cL


def frame7200_minor(fT):
    """Channel-minor decode_imbe7200_frame. fT: [8, 23, C] int32 bitplanes
    (the transpose of the API's [C, 8, 23]). Returns (dT [88, C], c0, perrs,
    c4). ECC kernels are shape-agnostic elementwise int math, so they are
    shared with the production path — only the array orientation differs."""
    from mbe_tpu.ops import demod, ecc
    p23 = jnp.asarray(imbe._POW2_23)[None, :, None]
    w = jnp.sum(fT * p23, axis=1)  # [8, C] packed rows
    c0w, c0_errs = ecc.golay2312_hard_packed(w[0])

    seed = 16 * (c0w >> 11)
    # keystream words channel-minor: [total, C] bits -> [6, C] words
    A = jnp.asarray(T.demod_prng_A[1:115]).astype(jnp.uint32)
    B = jnp.asarray(T.demod_prng_B[1:115]).astype(jnp.uint32)
    pr = ((A[:, None] * seed.astype(jnp.uint32)[None, :] + B[:, None])
          >> 15).astype(jnp.int32) & 1  # [114, C]
    widths = (23, 23, 23, 15, 15, 15)
    W = np.zeros((sum(widths), len(widths)), np.float32)
    k = 0
    for r, wd in enumerate(widths):
        for m in range(wd):
            W[k + m, r] = float(1 << (wd - 1 - m))
        k += wd
    kw = jnp.matmul(jnp.asarray(W).T, pr.astype(jnp.float32),
                    precision=HP,
                    preferred_element_type=jnp.float32).astype(jnp.int32)

    g_out, g_errs = ecc.golay2312_hard_packed(w[1:4] ^ kw[0:3])
    h_out, h_errs = ecc.hamming1511_hard_packed((w[4:7] & 0x7FFF) ^ kw[3:6])
    perrs = jnp.sum(g_errs, axis=0) + jnp.sum(h_errs, axis=0)
    c4_errs = h_errs[0]

    def extract(word, hi, lo):
        shifts = jnp.arange(hi, lo - 1, -1, dtype=jnp.int32)[:, None]
        return (word[None, :] >> shifts) & 1

    dparts = [extract(c0w, 22, 11)]
    for i in range(3):
        dparts.append(extract(g_out[i], 22, 11))
    for i in range(3):
        dparts.append(extract(h_out[i], 14, 4))
    dparts.append(extract(w[7], 6, 0))
    dT = jnp.concatenate(dparts, axis=0)  # [88, C]
    return dT, c0_errs, perrs, c4_errs


def decode_minor(d, curT, prevT, dT=None):
    """Channel-minor decode_imbe4400_parms. d: [C,88] (as delivered by the
    frame stage); all 2-D inputs/outputs are [57,C]. Returns the decoded
    fields + consumable sums."""
    tb = imbe._decode_tables()
    if dT is None:
        c = d.shape[0]
        dT = d.astype(jnp.float32).T  # [88, C] — one boundary transpose
        b0 = bit_ops.pack_msb_first(d, _B0_IDX)
    else:
        c = dT.shape[1]
        dT = dT.astype(jnp.float32)
        wts = jnp.asarray(
            (1 << np.arange(len(_B0_IDX) - 1, -1, -1)).astype(np.int32))
        b0 = jnp.sum(dT[jnp.asarray(_B0_IDX), :].astype(jnp.int32)
                     * wts[:, None], axis=0)
    bad = (b0 > 207).astype(jnp.int32)
    b0s = jnp.clip(b0, 0, 207)
    w0 = bit_ops.lut1d(b0s, np.asarray(T.imbe_w0_by_b0, np.float32))
    L = bit_ops.lut1d(b0s, np.asarray(T.imbe_L_by_b0, np.int32))
    K = bit_ops.lut1d(b0s, np.asarray(T.imbe_K_by_b0, np.int32))
    L9 = L - 9
    onehotT = (L9[None, :] == jnp.arange(48, dtype=jnp.int32)[:, None]
               ).astype(jnp.float32)  # [48, C]

    colsel = jnp.matmul(jnp.asarray(tb["colT"]).T, onehotT, precision=HP,
                        preferred_element_type=jnp.float32)  # [88, C]
    wsel = jnp.matmul(jnp.asarray(tb["wT"]).T, onehotT, precision=HP,
                      preferred_element_type=jnp.float32)
    p = wsel * dT
    cols = jnp.arange(tb["NCOLS"], dtype=jnp.float32)[:, None]
    vals = jnp.zeros((tb["NCOLS"], c), jnp.float32)
    for i in range(88):
        vals = vals + jnp.where(colsel[i:i + 1, :] == cols,
                                p[i:i + 1, :], 0.0)  # [72, C]

    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    tl_idx = jnp.clip(K[None, :] - 1 - (li - 1) // 3, 0, 11)
    bb1 = vals[:12]
    vl_f = jnp.zeros((57, c), jnp.float32)
    for t in range(12):
        vl_f = jnp.where(tl_idx == t, bb1[t:t + 1, :], vl_f)
    vl_bits = vl_f.astype(jnp.int32)
    band_mask = (li >= 1) & (li <= L[None, :])
    Vl = jnp.where(band_mask, vl_bits, curT["Vl"])

    b2 = vals[12].astype(jnp.int32)
    Gm1 = bit_ops.lut1d(b2, np.asarray(T.B2, np.float32))
    gain_step = jnp.matmul(jnp.asarray(tb["gain_step"]).T, onehotT,
                           precision=HP,
                           preferred_element_type=jnp.float32)  # [5, C]
    gain_off = jnp.matmul(jnp.asarray(tb["gain_off"]).T, onehotT,
                          precision=HP, preferred_element_type=jnp.float32)
    Gm_rest = gain_step * ((vals[13:18] - gain_off) + jnp.float32(0.5))
    Gm = jnp.concatenate([Gm1[None, :], Gm_rest], axis=0)  # [6, C]
    Ri = jnp.matmul(jnp.asarray(tb["RiM"]).T, Gm, precision=HP,
                    preferred_element_type=jnp.float32)  # [6, C]

    qfac = jnp.matmul(jnp.asarray(tb["hoc_qfac"]).T, onehotT, precision=HP,
                      preferred_element_type=jnp.float32)  # [54, C]
    off = jnp.matmul(jnp.asarray(tb["hoc_off"]).T, onehotT, precision=HP,
                     preferred_element_type=jnp.float32)
    valid = jnp.matmul(jnp.asarray(tb["m_valid"].astype(np.float32)).T,
                       onehotT, precision=HP,
                       preferred_element_type=jnp.float32) > 0.5
    hoc = qfac * ((vals[18:72] - off) + jnp.float32(0.5))
    hoc = jnp.where(valid, hoc, 0.0).reshape(6, 9, c)

    Cik = jnp.concatenate([Ri.reshape(6, 1, c), hoc], axis=1)  # [6, 10, C]

    M3 = np.asarray(tb["Midct"]).reshape(10, 11, 10)
    M100 = np.ascontiguousarray(M3.transpose(1, 0, 2).reshape(11, 100))
    lo = jnp.floor_divide(L, 6)
    lof = lo.astype(jnp.float32)[None, :]  # [1, C]
    nlo = (6 - (L - 6 * lo))[None, :]
    ehi = jnp.arange(6, dtype=jnp.int32)[:, None] >= nlo  # [6, C]
    Mlo = jnp.zeros((100, c), jnp.float32)
    Mhi = jnp.zeros((100, c), jnp.float32)
    for v in range(1, 10):
        mv = lof == jnp.float32(v)
        Mlo = jnp.where(mv, jnp.asarray(M100[v])[:, None], Mlo)
        Mhi = jnp.where(mv, jnp.asarray(M100[v + 1])[:, None], Mhi)
    ehx = ehi[:, None, :]  # [6, 1, C]
    Usel = jnp.zeros((6, 10, c), jnp.float32)
    for k in range(10):
        wk = jnp.where(ehx, Mhi[10 * k:10 * k + 10][None, :, :],
                       Mlo[10 * k:10 * k + 10][None, :, :])
        Usel = Usel + Cik[:, k, :][:, None, :] * wk
    Usel = Usel.reshape(60, c)

    sclT = jnp.matmul(jnp.asarray(tb["scl"], jnp.bfloat16).T,
                      onehotT.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)  # [57, C]
    Tl = jnp.zeros((57, c), jnp.float32)
    for s in range(60):
        Tl = jnp.where(sclT == jnp.float32(s), Usel[s:s + 1, :], Tl)

    rho = jnp.where(L <= 15, jnp.float32(0.4),
                    jnp.where(L <= 24,
                              jnp.float32(0.03) * L.astype(jnp.float32)
                              - jnp.float32(0.05),
                              jnp.float32(0.7)))
    Ml_n, log2_n, pM, pLg, cL = spectral_update_m(
        L, prevT["L"], prevT["Ml"], prevT["log2Ml"], Tl, weight=rho,
        cur_Ml=curT["Ml"], cur_log2Ml=curT["log2Ml"])

    ok = (bad == 0)
    okc = ok[None, :]
    return dict(
        w0=jnp.where(ok, w0, curT["w0"]),
        L=jnp.where(ok, cL, curT["L"]),
        K=jnp.where(ok, K, curT["K"]),
        Vl=jnp.where(okc, Vl, curT["Vl"]),
        Ml=jnp.where(okc, Ml_n, curT["Ml"]),
        log2Ml=jnp.where(okc, log2_n, curT["log2Ml"]),
        prev_Ml=jnp.where(okc, pM, prevT["Ml"]),
        prev_log2Ml=jnp.where(okc, pLg, prevT["log2Ml"]),
        bad=bad)


# --- harness ------------------------------------------------------------------

def make_inputs(c, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.integers(0, 2, (c, 88)).astype(np.int32)
    L = rng.integers(9, 57, (c,)).astype(np.int32)

    def parms():
        return dict(
            w0=rng.uniform(0.05, 0.3, c).astype(np.float32),
            L=L, K=rng.integers(3, 13, (c,)).astype(np.int32),
            Vl=rng.integers(0, 2, (c, 57)).astype(np.int32),
            Ml=rng.uniform(0.1, 10, (c, 57)).astype(np.float32),
            log2Ml=rng.uniform(-4, 4, (c, 57)).astype(np.float32))

    return d, parms(), parms()


def to_parms(p, c):
    z = np.zeros(c, np.float32)
    z57 = np.zeros((c, 57), np.float32)
    return Parms(w0=jnp.asarray(p["w0"]), L=jnp.asarray(p["L"]),
                 K=jnp.asarray(p["K"]), Vl=jnp.asarray(p["Vl"]),
                 Ml=jnp.asarray(p["Ml"]), log2Ml=jnp.asarray(p["log2Ml"]),
                 PHIl=jnp.asarray(z57), PSIl=jnp.asarray(z57),
                 gamma=jnp.asarray(z), tonePhase=jnp.zeros(c, jnp.uint32),
                 swn=jnp.zeros(c, jnp.uint32), localEnergy=jnp.asarray(z),
                 amplitudeThreshold=jnp.zeros(c, jnp.int32),
                 errorRate=jnp.asarray(z),
                 errorCountTotal=jnp.zeros(c, jnp.int32),
                 errorCount4=jnp.zeros(c, jnp.int32),
                 repeatCount=jnp.zeros(c, jnp.int32),
                 mutingThreshold=jnp.asarray(z),
                 previousUw=jnp.zeros((c, 128), jnp.float32),
                 noiseSeed=jnp.asarray(z),
                 noisePrevSeed=jnp.asarray(z))


def to_minor(p):
    out = {}
    for k, v in p.items():
        a = np.asarray(v)
        out[k] = jnp.asarray(a.T.copy() if a.ndim == 2 else a)
    return out


def check():
    c = 256
    rng = np.random.default_rng(7)
    f = rng.integers(0, 2, (c, 8, 23)).astype(np.int32)
    d_maj, c0_m, pe_m, c4_m = imbe.decode_imbe7200_frame(jnp.asarray(f))
    fT = jnp.asarray(np.ascontiguousarray(f.transpose(1, 2, 0)))
    dT, c0_n, pe_n, c4_n = frame7200_minor(fT)
    frame_ok = (np.array_equal(np.asarray(d_maj), np.asarray(dT).T)
                and np.array_equal(np.asarray(c0_m), np.asarray(c0_n))
                and np.array_equal(np.asarray(pe_m), np.asarray(pe_n))
                and np.array_equal(np.asarray(c4_m), np.asarray(c4_n)))
    print("frame stage:", "BIT-EXACT" if frame_ok else "FAILED")

    d, cur, prev = make_inputs(c)
    cp, pp = to_parms(cur, c), to_parms(prev, c)
    cur_o, prev_o, bad = imbe.decode_imbe4400_parms(jnp.asarray(d), cp, pp)
    r = decode_minor(jnp.asarray(d), to_minor(cur), to_minor(prev))
    # exact: every field whose math has no cross-axis reduction. tolerance:
    # Ml/log2Ml go through ssum (a 57-wide reduce whose order differs
    # between lane- and sublane-axis reductions) — same math, different
    # rounding, bounded at ~2e-6 in the log2 domain (~120 dB).
    exact = [
        ("w0", cur_o.w0, r["w0"]), ("L", cur_o.L, r["L"]),
        ("K", cur_o.K, r["K"]), ("Vl", cur_o.Vl, r["Vl"].T),
        ("bad", bad, r["bad"]),
        ("prev_Ml", prev_o.Ml, r["prev_Ml"].T),
        ("prev_log2Ml", prev_o.log2Ml, r["prev_log2Ml"].T),
    ]
    close = [
        ("Ml", cur_o.Ml, r["Ml"].T, 1e-5),
        ("log2Ml", cur_o.log2Ml, r["log2Ml"].T, 1e-5),
    ]
    ok = True
    for name, a, b in exact:
        a, b = np.asarray(a), np.asarray(b)
        if not np.array_equal(a, b):
            nd = int((a != b).sum())
            print(f"MISMATCH {name}: {nd}/{a.size} differ, "
                  f"max abs {np.abs(a.astype(np.float64)-b.astype(np.float64)).max():.3e}")
            ok = False
    for name, a, b, tol in close:
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # rel for the linear-domain Ml, abs for log2Ml (crosses zero)
        err = np.abs(a - b) / np.maximum(np.abs(a), 1.0)
        if err.max() > tol:
            print(f"MISMATCH {name}: max err {err.max():.3e} > {tol}")
            ok = False
    print("check:", "BIT-EXACT" if ok else "FAILED")
    return ok and frame_ok


def ab(c, steps):
    d, cur, prev = make_inputs(c)
    cp, pp = to_parms(cur, c), to_parms(prev, c)
    curm, prevm = to_minor(cur), to_minor(prev)
    dj = jnp.asarray(d)
    rng = np.random.default_rng(7)
    f = rng.integers(0, 2, (c, 8, 23)).astype(np.int32)
    fj = jnp.asarray(f)
    fTj = jnp.asarray(np.ascontiguousarray(f.transpose(1, 2, 0)))
    xs = jnp.arange(1, steps + 1, dtype=jnp.int32)

    @jax.jit
    def run_major(dj, cp, pp):
        def body(acc, x):
            co, po, bad = imbe.decode_imbe4400_parms(dj ^ (x & 1), cp, pp)
            return acc + jnp.sum(co.Ml) + jnp.sum(po.log2Ml) \
                + jnp.sum(co.Vl) + jnp.sum(bad), 0
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    @jax.jit
    def run_minor(dj, curm, prevm):
        def body(acc, x):
            r = decode_minor(dj ^ (x & 1), curm, prevm)
            return acc + jnp.sum(r["Ml"]) + jnp.sum(r["prev_log2Ml"]) \
                + jnp.sum(r["Vl"]) + jnp.sum(r["bad"]), 0
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    @jax.jit
    def frame_major(fj):
        def body(acc, x):
            dd, c0, pe, c4 = imbe.decode_imbe7200_frame(fj ^ (x & 1))
            return acc + jnp.sum(dd) + jnp.sum(c0) + jnp.sum(pe) \
                + jnp.sum(c4), 0
        return jax.lax.scan(body, jnp.int32(0), xs)[0]

    @jax.jit
    def frame_minor(fTj):
        def body(acc, x):
            dT, c0, pe, c4 = frame7200_minor(fTj ^ (x & 1))
            return acc + jnp.sum(dT) + jnp.sum(c0) + jnp.sum(pe) \
                + jnp.sum(c4), 0
        return jax.lax.scan(body, jnp.int32(0), xs)[0]

    def t(f, *a):
        jax.block_until_ready(f(*a))
        best = np.inf
        for _ in range(4):
            t0 = time.time()
            jax.block_until_ready(f(*a))
            best = min(best, (time.time() - t0) / steps)
        return best

    tm = t(run_major, dj, cp, pp)
    tn = t(run_minor, dj, curm, prevm)
    print(f"C={c} param_decode major {tm*1e3:.3f} ms  minor {tn*1e3:.3f} ms"
          f"  ratio {tm/tn:.3f}x", flush=True)
    tfm = t(frame_major, fj)
    tfn = t(frame_minor, fTj)
    print(f"C={c} frame_ecc    major {tfm*1e3:.3f} ms  minor {tfn*1e3:.3f} ms"
          f"  ratio {tfm/tfn:.3f}x", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        sys.exit(0 if check() else 1)
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    ab(c, steps)
