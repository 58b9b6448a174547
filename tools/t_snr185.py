#!/usr/bin/env python3
"""Root-cause the global worst-case SNR frame (VERDICT r4 #3).

The audit's argmin is long_imbe7200 (t=185, ch=1) at 62.6 dB — the same
number across three rounds. This script separates
  (a) accumulated state divergence (185 frames of f32 drift through the
      log2Ml predictor / PSIl phases / previousUw) from
  (b) a frame-185 stage error,
by replaying the reference per-frame via ctypes (tools/ref.py), rebuilding
our ChannelState at t=184 from the REFERENCE parms, and re-stepping frame
185. Then it substitutes reference float fields into OUR t=184 state one
at a time to name the field (and so the producing stage) that sets the
floor. Bit-domain fields are asserted equal first (they must be exact).

Usage: python tools/t_snr185.py [vec] [ch] [t]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402
import ref as refmod  # noqa: E402

VEC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "vectors")


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    p_sig = np.mean(ref ** 2)
    p_err = np.mean(err ** 2)
    if p_sig < 1e-12:
        return np.inf if p_err < 1e-12 else -np.inf
    return 10.0 * np.log10(p_sig / max(p_err, 1e-30))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "long_imbe7200"
    ch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    tt = int(sys.argv[3]) if len(sys.argv) > 3 else 185
    codec = name.split("_", 1)[1]
    vec = np.load(os.path.join(VEC, f"{name}.npz"))
    frames, golden = vec["frames"], vec["pcm"]
    T, C = frames.shape[:2]

    # ---- our decoder: host loop so we can keep the t-1 state -------------
    step = jax.jit(lambda fr, s: pipeline.step(codec, fr, s)[:3])
    state = st.init_state(C, rng_seed=vec["seeds"])
    snrs = np.zeros(T)
    state_tm1 = None
    for t in range(T):
        if t == tt:
            state_tm1 = jax.device_get(state)
        state, pcm, res = step(frames[t], state)
        snrs[t] = snr_db(golden[t, ch], np.asarray(pcm)[ch])
    lo = max(0, tt - 8)
    print("our SNR trajectory ch=%d:" % ch)
    for t in range(lo, min(T, tt + 4)):
        print(f"  t={t:3d}  {snrs[t]:7.1f} dB" + ("  <-- target" if t == tt else ""))

    # ---- reference replay (ch only), capturing parms at t-1 --------------
    R = refmod.Ref()
    R.set_seed(int(vec["seeds"][ch]))
    cur, prev, enh = R.init_parms()
    ref_seed_hist = []
    ref_tm1 = None
    for t in range(tt + 1):
        if t == tt:
            ref_tm1 = {k: (R.parms_to_dict(p)) for k, p in
                       (("cur", cur), ("prev", prev), ("enh", enh))}
        pcm_r, _, _, _ = R.process_frame_f(codec, frames[t, ch], cur, prev, enh)
        ref_seed_hist.append(np.float32(cur.noiseSeed))
        if t == tt:
            ok = snr_db(golden[t, ch], pcm_r)
            print(f"ref replay sanity @t={tt}: {ok:.1f} dB vs golden "
                  f"(expect inf/=,bit-exact)")

    # ---- bit-domain fields must match exactly ----------------------------
    ours = state_tm1
    int_fields = ["L", "K", "Vl", "tonePhase", "swn", "amplitudeThreshold",
                  "errorCountTotal", "errorCount4", "repeatCount"]
    for part in ("cur", "prev", "enh"):
        op = getattr(ours, part)
        if op is None:
            op = ours.cur
        rp = ref_tm1[part]
        for f in int_fields:
            ov = np.asarray(getattr(op, f))
            ov = ov[..., ch] if ov.ndim else ov
            rv = rp[f]
            if not np.array_equal(ov, rv):
                print(f"INT MISMATCH {part}.{f}: ours={ov} ref={rv}")
    print("int-domain fields checked (silence = all equal)")
    # noiseSeed is f32-held but integer-valued
    for part in ("cur", "prev"):
        ov = float(np.asarray(getattr(ours, "cur" if part == "cur" else "prev").noiseSeed)[ch])
        rv = float(ref_tm1[part]["noiseSeed"])
        if ov != rv:
            print(f"noiseSeed MISMATCH {part}: ours={ov} ref={rv}")

    # ---- rebuild our state at t-1 from ref parms and restep --------------
    def with_ref_fields(base_state, fields, parts=("cur", "prev", "enh")):
        s = jax.device_get(base_state)
        for part in parts:
            p = getattr(s, part)
            if p is None:
                continue
            rp = ref_tm1[part]
            repl = {}
            for f in fields:
                arr = np.array(np.asarray(getattr(p, f)))
                if f == "previousUw":
                    arr[:, ch] = rp["previousUw"][128:]
                elif arr.ndim == 2:
                    arr[:, ch] = rp[f]
                else:
                    arr[ch] = rp[f]
                repl[f] = jnp.asarray(arr)
            s = dataclasses.replace(
                s, **{part: dataclasses.replace(p, **repl)})
        return s

    def restep(s):
        _, pcm, _ = step(frames[tt], s)
        return snr_db(golden[tt, ch], np.asarray(pcm)[ch])

    base = restep(state_tm1)
    print(f"\nrestep with OUR t-1 state:      {base:7.1f} dB (baseline)")
    allf = ["w0", "Ml", "log2Ml", "PHIl", "PSIl", "gamma", "localEnergy",
            "errorRate", "previousUw"]
    full = restep(with_ref_fields(state_tm1, allf))
    print(f"restep with REF t-1 floats:     {full:7.1f} dB "
          f"(high => accumulated state; low => frame-{tt} stage)")
    for f in allf:
        s = restep(with_ref_fields(state_tm1, [f]))
        print(f"  + ref {f:12s} only:       {s:7.1f} dB")
    # and the complement: everything EXCEPT one field
    for f in allf:
        rest = [g for g in allf if g != f]
        s = restep(with_ref_fields(state_tm1, rest))
        print(f"  + ref all-but-{f:12s}:    {s:7.1f} dB")


if __name__ == "__main__":
    main()
