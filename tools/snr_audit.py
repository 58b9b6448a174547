#!/usr/bin/env python3
"""Worst-case golden-SNR audit across every committed vector set.

Re-measures the advertised fidelity numbers (BASELINE.md / PARITY.md) under
the SHIPPED defaults (MBE_TPU_FFT_PRECISION=high unless overridden) on the
current backend. Prints per-set worst/median per-frame SNR and the global
worst, plus the frame that attains it.

Usage: python tools/snr_audit.py [highest]   # arg forces DFT HIGHEST
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if len(sys.argv) > 1 and sys.argv[1] == "highest":
    os.environ["MBE_TPU_FFT_PRECISION"] = "highest"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402

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


def audit(name, codec, soft):
    vec = np.load(os.path.join(VEC, f"{name}.npz"))
    frames = vec["frames"]
    T, C = frames.shape[:2]
    state = st.init_state(C, rng_seed=vec["seeds"])
    rel = vec["rel"] if soft else None

    def run(fr, rl, s):
        return pipeline.run_sequence(codec, fr, s, soft_rel=rl)

    _, pcm, _ = jax.jit(run)(frames, rel, state)
    pcm = np.asarray(pcm)
    snrs = np.array([[snr_db(vec["pcm"][t, i], pcm[t, i])
                      for i in range(C)] for t in range(T)])
    finite = snrs[np.isfinite(snrs)]
    t, i = np.unravel_index(np.argmin(snrs), snrs.shape)
    print(f"{name:24s} worst {snrs.min():6.1f} dB @ (t={t},ch={i})  "
          f"median {np.median(finite):6.1f} dB", flush=True)
    return snrs.min()


def main():
    prec = os.environ.get("MBE_TPU_FFT_PRECISION", "high")
    print(f"backend={jax.devices()[0].platform} fft_precision={prec}")
    worst = np.inf
    for codec in ("imbe7200", "imbe7100", "ambe2450", "ambe2400"):
        for suffix, soft in (("", False), ("_soft", True)):
            worst = min(worst, audit(f"e2e_{codec}{suffix}", codec, soft))
        worst = min(worst, audit(f"long_{codec}", codec, False))
    print(f"GLOBAL worst per-frame SNR: {worst:.1f} dB")


if __name__ == "__main__":
    main()
