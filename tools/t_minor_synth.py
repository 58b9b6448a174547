"""Channel-minor ([..., C]) prototype of the synthesis band chain.

Companion to t_minor_decode.py: clones spectral_amp_enhance ->
adaptive_smoothing -> reconcile_model_lengths -> update_phases ->
unvoiced_fft with the channel axis minor ([57,C], [129,C], [256,C]) and
A/Bs against the production channel-major path in one process.

  python tools/t_minor_synth.py check          # CPU numerical parity
  python tools/t_minor_synth.py ab [C] [steps] # TPU same-process A/B
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

from mbe_tpu.ops import enhance, fft as fft_ops, synth  # noqa: E402
from mbe_tpu.tables import T  # noqa: E402

FRAME = 160
FFT_SIZE = 256
FLOAT_MAX = np.float32(np.finfo(np.float32).max)
TWO_PI = np.float32(2.0 * np.pi)
M_256_OVER_2PI = synth.M_256_OVER_2PI
UNVOICED_SCALE_COEFF = synth.UNVOICED_SCALE_COEFF


def band_mask_m(L):
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    return (li >= 1) & (li <= L[None, :])


def spectral_amp_enhance_m(w0, L, Ml):
    """Channel-minor spectral_amp_enhance; Ml [57, C]."""
    valid = (L >= 1) & (L <= 56)
    mask = band_mask_m(L)
    w0s = jnp.where(w0 > 1e-12, w0, jnp.float32(1.0))
    lf = jnp.arange(57, dtype=jnp.float32)[:, None]

    cos_tab = jnp.cos(w0s[None, :] * lf)  # [57, C]
    Ml2 = jnp.where(mask, Ml * Ml, 0.0)
    Rm0 = jnp.sum(Ml2, axis=0)
    Rm1 = jnp.sum(Ml2 * cos_tab, axis=0)
    R2m0 = Rm0 * Rm0
    R2m1 = Rm1 * Rm1

    num = jnp.float32(0.96 * np.pi) * ((R2m0 + R2m1)[None, :]
                                       - 2.0 * (Rm0 * Rm1)[None, :] * cos_tab)
    den = (w0s * Rm0 * (R2m0 - R2m1))[None, :]
    ratio = num / jnp.where(den != 0.0, den, jnp.float32(1.0))
    ratio = jnp.where(den != 0.0, ratio, jnp.float32(1.0))
    ratio = jnp.where(jnp.isfinite(ratio) & (ratio >= 0.0), ratio,
                      jnp.float32(1.0))
    Wl = jnp.sqrt(jnp.maximum(Ml, 0.0)) * jnp.sqrt(jnp.sqrt(ratio))
    Wl = jnp.where(jnp.isfinite(Wl), Wl, jnp.float32(1.0))

    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    low_band = (8 * li) <= L[None, :]
    factor = jnp.clip(Wl, 0.5, 1.2)
    keep = low_band | (Ml == 0.0)
    Ml_w = jnp.where(mask & ~keep, factor * Ml, Ml)

    sum_sq = jnp.sum(jnp.where(mask, jnp.abs(Ml_w) ** 2, 0.0), axis=0)
    gamma = jnp.where(sum_sq == 0.0, jnp.float32(1.0),
                      jnp.sqrt(Rm0 / jnp.where(sum_sq == 0.0, 1.0, sum_sq)))
    Ml_out = jnp.where(mask, gamma[None, :] * Ml_w, Ml_w)

    Ml_out = jnp.where(valid[None, :], Ml_out, Ml)
    rm0_out = jnp.where(valid, Rm0, 0.0)
    return Ml_out, rm0_out


def adaptive_smoothing_m(Ml, Vl, L, error_rate, error_total, error_count4,
                         prev_local_energy, prev_amplitude_threshold, rm0):
    mask = band_mask_m(L)
    prev_e = jnp.where(prev_local_energy < 10000.0, jnp.float32(75000.0),
                       prev_local_energy)
    local_energy = jnp.float32(0.95) * prev_e + jnp.float32(0.05) * rm0
    local_energy = jnp.maximum(local_energy, jnp.float32(10000.0))

    x8 = jnp.sqrt(jnp.sqrt(jnp.sqrt(local_energy)))
    energy = x8 * x8 * x8
    vm_mid = (jnp.float32(45.255) * energy) / jnp.exp(
        jnp.float32(277.26) * error_rate)
    vm_hi = jnp.float32(1.414) * energy
    vm = jnp.where((error_rate <= 0.005) & (error_total <= 4), FLOAT_MAX,
                   jnp.where((error_rate <= 0.0125) & (error_count4 == 0),
                             vm_mid, vm_hi))
    Vl_out = jnp.where(mask & (Ml > vm[None, :]), 1, Vl)
    Am = jnp.sum(jnp.where(mask, Ml, 0.0), axis=0)
    prev_t = jnp.where(prev_amplitude_threshold <= 0, 20480,
                       prev_amplitude_threshold)
    tm = jnp.where((error_rate <= 0.005) & (error_total <= 6),
                   jnp.int32(20480),
                   jnp.int32(6000) - jnp.int32(300) * error_total + prev_t)
    do_scale = (Am > tm.astype(jnp.float32)) & (Am > 0.0)
    scale = tm.astype(jnp.float32) / jnp.where(Am != 0.0, Am, 1.0)
    Ml_out = jnp.where(mask & do_scale[None, :], Ml * scale[None, :], Ml)
    return Ml_out, Vl_out, local_energy, tm


def reconcile_m(cur_L, cur_Ml, cur_Vl, prev_L, prev_Ml, prev_Vl):
    maxl = jnp.maximum(cur_L, prev_L)
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    grow_prev = ((cur_L > prev_L)[None, :] & (li > prev_L[None, :])
                 & (li <= cur_L[None, :]))
    grow_cur = ((cur_L <= prev_L)[None, :] & (li > cur_L[None, :])
                & (li <= prev_L[None, :]))
    prev_Ml = jnp.where(grow_prev, 0.0, prev_Ml)
    prev_Vl = jnp.where(grow_prev, 1, prev_Vl)
    cur_Ml = jnp.where(grow_cur, 0.0, cur_Ml)
    cur_Vl = jnp.where(grow_cur, 1, cur_Vl)
    return maxl, cur_Ml, cur_Vl, prev_Ml, prev_Vl


def count_unvoiced_m(Vl, L):
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    m = li <= L[None, :]
    return jnp.sum(jnp.where(m & (Vl == 0), 1, 0), axis=0)


def update_phases_m(cur_w0, cur_L, cur_PSIl_old, cur_PHIl_old,
                    prev_w0, prev_PSIl, noise_buffer, num_uv):
    """noise_buffer here is [256, C] (channel-minor)."""
    li = jnp.arange(57, dtype=jnp.float32)[:, None]
    lii = jnp.arange(57, dtype=jnp.int32)[:, None]
    psi_wrapped = jnp.mod(prev_PSIl, TWO_PI)
    psi_wrapped = jnp.where(psi_wrapped < 0.0, psi_wrapped + TWO_PI,
                            psi_wrapped)
    lN = li * jnp.float32(FRAME)
    cur_psi = psi_wrapped + (prev_w0 + cur_w0)[None, :] * (lN / 2.0)
    pl_ = synth.WHITE_NOISE_SCALAR * noise_buffer[:57, :] \
        - jnp.float32(np.pi)
    jitter = (num_uv.astype(jnp.float32)[None, :] * pl_) \
        / cur_L.astype(jnp.float32)[None, :]
    low = lii <= (cur_L // 4)[None, :]
    cur_phi = jnp.where(low, cur_psi, cur_psi + jitter)
    band0 = lii == 0
    cur_psi = jnp.where(band0, cur_PSIl_old, cur_psi)
    cur_phi = jnp.where(band0, cur_PHIl_old, cur_phi)
    psi_wrapped = jnp.where(band0, prev_PSIl, psi_wrapped)
    return cur_psi, cur_phi, psi_wrapped


def band_of_bins_m(cur_w0):
    mult = M_256_OVER_2PI * cur_w0
    kf = jnp.arange(FFT_SIZE // 2 + 1, dtype=jnp.float32)[:, None]  # [129,1]
    m = mult[None, :]
    safe = m > 0.0
    band = jnp.floor(kf / jnp.where(safe, m, 1.0) + jnp.float32(0.5))
    for _ in range(2):
        lo = jnp.ceil((band - jnp.float32(0.5)) * m)
        hi = jnp.ceil((band + jnp.float32(0.5)) * m)
        band = (band + (kf >= hi).astype(jnp.float32)
                - (kf < lo).astype(jnp.float32))
    return jnp.where(safe & (kf < jnp.float32(FFT_SIZE // 2)), band,
                     jnp.float32(-1.0))


def unvoiced_fft_m(cur_w0, cur_L, cur_Ml, cur_Vl, previous_uw, noise_buffer):
    """Channel-minor unvoiced_fft: 2-D args are [57,C]/[256,C]."""
    synth._lazy_tables()
    uw = noise_buffer * jnp.asarray(synth._WIN256)[:, None]  # [256, C]

    # packed DFT pair as [258,256] @ [256,C] (same matrices, transposed)
    fc, fs, ic, isn = fft_ops._mats()
    fwd = jnp.asarray(np.concatenate([fc, fs], axis=1).T.copy())  # [258,256]
    inv = jnp.asarray(np.concatenate([ic, isn], axis=0).T.copy())  # [256,258]
    reim = jnp.matmul(fwd, uw, precision=fft_ops._prec(),
                      preferred_element_type=jnp.float32)
    Xre = reim[:fft_ops.NBINS, :]
    Xim = reim[fft_ops.NBINS:, :]

    mult = M_256_OVER_2PI * cur_w0
    lf = jnp.arange(57, dtype=jnp.float32)[:, None]
    a_min = jnp.maximum(jnp.ceil((lf - 0.5) * mult[None, :]), 0.0)
    b_max = jnp.minimum(jnp.ceil((lf + 0.5) * mult[None, :]),
                        jnp.float32(FFT_SIZE // 2))
    lmask = band_mask_m(cur_L) & (cur_Vl == 0)

    band = band_of_bins_m(cur_w0)  # [129, C]
    mag2 = Xre * Xre + Xim * Xim   # [129, C]
    eq = band[None, :, :] == lf[:, :1][..., None]  # [57,129,C] fused
    numerator = jnp.sum(jnp.where(eq, mag2[None, :, :], 0.0), axis=1)
    bin_count = b_max - a_min
    ok = lmask & (bin_count > 0) & (numerator > 1e-10)
    denom = jnp.where(bin_count > 0, bin_count, 1.0)
    mean = numerator / denom
    scalor = UNVOICED_SCALE_COEFF * cur_Ml / jnp.sqrt(
        jnp.where(mean > 0, mean, 1.0))
    scalor = jnp.where(ok, scalor, 0.0)

    bin_scalor = jnp.zeros_like(mag2)
    for l in range(57):
        bin_scalor = jnp.where(band == jnp.float32(l),
                               scalor[l:l + 1, :], bin_scalor)
    scal2 = jnp.concatenate([bin_scalor, bin_scalor], axis=0)  # [258, C]
    uw_out = jnp.matmul(inv, reim * scal2,
                        precision=fft_ops._prec(),
                        preferred_element_type=jnp.float32)  # [256, C]

    zeros32 = jnp.zeros((32, uw_out.shape[1]), jnp.float32)
    prev_part = jnp.concatenate([previous_uw[128:, :], zeros32], axis=0)
    curr_part = jnp.concatenate([zeros32, uw_out[:128, :]], axis=0)
    wp = jnp.asarray(synth._W_PREV)[:, None]
    wc = jnp.asarray(synth._W_CURR)[:, None]
    dn = jnp.asarray(synth._W_DENOM)[:, None]
    add = jnp.where(dn > 1e-10, (wp * prev_part + wc * curr_part) / dn, 0.0)
    return add, uw_out


# --- chains -------------------------------------------------------------------

def chain_major(w0, L, Ml, Vl, pw0, pL, pMl, pVl, psi, phi, ppsi, puw, nbuf,
                er, et, e4, ple, pat):
    Ml_e, rm0 = enhance.spectral_amp_enhance(w0, L, Ml)
    Ml_s, Vl_s, le, at = enhance.adaptive_smoothing(
        Ml_e, Vl, L, er, et, e4, ple, pat, rm0)
    maxl, cM, cV, pM, pV = synth.reconcile_model_lengths(
        L, Ml_s, Vl_s, pL, pMl, pVl)
    nuv = synth.count_unvoiced(cV, L)
    cpsi, cphi, ppsi2 = synth.update_phases(w0, L, psi, phi, pw0, ppsi,
                                            nbuf, nuv)
    add, uw = synth.unvoiced_fft(w0, L, cM, cV, puw, nbuf)
    return (jnp.sum(add) + jnp.sum(uw) + jnp.sum(cpsi) + jnp.sum(cphi)
            + jnp.sum(ppsi2) + jnp.sum(pM) + jnp.sum(pV) + jnp.sum(le)
            + jnp.sum(at) + jnp.sum(maxl))


def chain_minor(w0, L, Ml, Vl, pw0, pL, pMl, pVl, psi, phi, ppsi, puw, nbuf,
                er, et, e4, ple, pat):
    Ml_e, rm0 = spectral_amp_enhance_m(w0, L, Ml)
    Ml_s, Vl_s, le, at = adaptive_smoothing_m(
        Ml_e, Vl, L, er, et, e4, ple, pat, rm0)
    maxl, cM, cV, pM, pV = reconcile_m(L, Ml_s, Vl_s, pL, pMl, pVl)
    nuv = count_unvoiced_m(cV, L)
    cpsi, cphi, ppsi2 = update_phases_m(w0, L, psi, phi, pw0, ppsi,
                                        nbuf, nuv)
    add, uw = unvoiced_fft_m(w0, L, cM, cV, puw, nbuf)
    return (jnp.sum(add) + jnp.sum(uw) + jnp.sum(cpsi) + jnp.sum(cphi)
            + jnp.sum(ppsi2) + jnp.sum(pM) + jnp.sum(pV) + jnp.sum(le)
            + jnp.sum(at) + jnp.sum(maxl))


def make(c, seed=0):
    rng = np.random.default_rng(seed)
    f = np.float32
    args = dict(
        w0=rng.uniform(0.05, 0.3, c).astype(f),
        L=rng.integers(9, 57, (c,)).astype(np.int32),
        Ml=rng.uniform(0.1, 10, (c, 57)).astype(f),
        Vl=rng.integers(0, 2, (c, 57)).astype(np.int32),
        pw0=rng.uniform(0.05, 0.3, c).astype(f),
        pL=rng.integers(9, 57, (c,)).astype(np.int32),
        pMl=rng.uniform(0.1, 10, (c, 57)).astype(f),
        pVl=rng.integers(0, 2, (c, 57)).astype(np.int32),
        psi=rng.uniform(0, 6.28, (c, 57)).astype(f),
        phi=rng.uniform(0, 6.28, (c, 57)).astype(f),
        ppsi=rng.uniform(-6.28, 6.28, (c, 57)).astype(f),
        puw=rng.standard_normal((c, 256)).astype(f),
        nbuf=rng.uniform(0, 53125, (c, 256)).astype(f),
        er=rng.uniform(0, 0.02, c).astype(f),
        et=rng.integers(0, 10, (c,)).astype(np.int32),
        e4=rng.integers(0, 2, (c,)).astype(np.int32),
        ple=rng.uniform(9000, 90000, c).astype(f),
        pat=rng.integers(-100, 30000, (c,)).astype(np.int32),
    )
    return args


def minorize(a):
    out = {}
    for k, v in a.items():
        out[k] = jnp.asarray(v.T.copy() if v.ndim == 2 else v)
    return out


ORDER = ["w0", "L", "Ml", "Vl", "pw0", "pL", "pMl", "pVl", "psi", "phi",
         "ppsi", "puw", "nbuf", "er", "et", "e4", "ple", "pat"]


def check():
    c = 256
    a = make(c)
    aj = {k: jnp.asarray(v) for k, v in a.items()}
    am = minorize(a)
    s1 = float(jax.jit(chain_major)(*[aj[k] for k in ORDER]))
    s2 = float(jax.jit(chain_minor)(*[am[k] for k in ORDER]))
    rel = abs(s1 - s2) / max(abs(s1), 1e-9)
    print(f"major consume-sum {s1:.6e}  minor {s2:.6e}  rel {rel:.2e}")
    ok = rel < 1e-4
    print("check:", "OK" if ok else "FAILED")
    return ok


def ab(c, steps):
    a = make(c)
    aj = {k: jnp.asarray(v) for k, v in a.items()}
    am = minorize(a)
    xs = jnp.arange(1, steps + 1, dtype=jnp.float32) * 1e-6

    def scan_of(chain, arr):
        order = ORDER

        @jax.jit
        def run(d):
            def body(acc, x):
                d2 = dict(d, Ml=d["Ml"] + x)  # input-dependent
                return acc + chain(*[d2[k] for k in order]), 0
            return jax.lax.scan(body, jnp.float32(0), xs)[0]
        return run

    def t(f, d):
        jax.block_until_ready(f(d))
        best = np.inf
        for _ in range(4):
            t0 = time.time()
            jax.block_until_ready(f(d))
            best = min(best, (time.time() - t0) / steps)
        return best

    tm = t(scan_of(chain_major, aj), aj)
    tn = t(scan_of(chain_minor, am), am)
    print(f"C={c} synth-band major {tm*1e3:.3f} ms  minor {tn*1e3:.3f} ms  "
          f"ratio {tm/tn:.3f}x", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        sys.exit(0 if check() else 1)
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    ab(c, steps)
