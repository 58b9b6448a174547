#!/usr/bin/env python3
"""Worst-case golden-SNR audit across every committed vector set.

Re-measures the advertised fidelity numbers (BASELINE.md / PARITY.md) under
the SHIPPED defaults (MBE_TPU_FFT_PRECISION=high unless overridden) on the
current backend. Prints per-set worst/median per-frame SNR and the global
worst, plus the frame that attains it.

The sweep also pins two non-default configurations the throughput numbers
and tests advertise (VERDICT r4 #4; reference analog: per-config golden
pinning in /root/reference/tests/test_golden_pcm.c:78-84):
  * NOTONES (DecoderConfig(tones_enabled=False)) against goldens from a
    real -DNOTONES=ON reference build (fsm_notones_*.npz), and
  * an invalid-lane frame (bit value 2) — exact silence + status -2 +
    state rollback on the corrupted lane, all other lanes bit-identical
    to the clean run.

Usage: python tools/snr_audit.py [highest] [--unroll N]
  highest      force DFT precision HIGHEST (default: shipped "high")
  --unroll N   drive run_sequence with lax.scan unroll=N — N=4 audits the
               exact graph bench.py ships its headline numbers from
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

unroll = 1
args = sys.argv[1:]
if "--unroll" in args:
    i = args.index("--unroll")
    unroll = int(args[i + 1])
    del args[i:i + 2]
if args and args[0] == "highest":
    os.environ["MBE_TPU_FFT_PRECISION"] = "highest"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

from mbe_tpu import api, pipeline  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402
from mbe_tpu.utils.config import DecoderConfig  # noqa: E402

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
        return pipeline.run_sequence(codec, fr, s, soft_rel=rl,
                                     unroll=unroll)

    _, pcm, _ = jax.jit(run)(frames, rel, state)
    pcm = np.asarray(pcm)
    snrs = np.array([[snr_db(vec["pcm"][t, i], pcm[t, i])
                      for i in range(C)] for t in range(T)])
    finite = snrs[np.isfinite(snrs)]
    t, i = np.unravel_index(np.argmin(snrs), snrs.shape)
    print(f"{name:24s} worst {snrs.min():6.1f} dB @ (t={t},ch={i})  "
          f"median {np.median(finite):6.1f} dB", flush=True)
    return snrs.min()


def audit_notones(codec):
    """NOTONES config vs goldens from a real -DNOTONES=ON reference build
    (tools/gen_notones_vectors.py). Tone-play frames must be EXACT silence;
    everything else is voice/concealment audio, SNR-bounded."""
    vec = np.load(os.path.join(VEC, f"fsm_notones_{codec}.npz"))
    dbits, totals = vec["dbits"], vec["totals"]
    state = st.init_state(1, rng_seed=np.uint32(vec["seed"]))
    fn = (api.process_ambe2450_dataf if codec == "ambe2450"
          else api.process_ambe2400_dataf)
    cfg = DecoderConfig(tones_enabled=False)
    run = jax.jit(lambda d, s, te: fn(d, s, te, config=cfg))
    worst, tones = np.inf, 0
    for t in range(dbits.shape[0]):
        audio, state, fsm = run(
            dbits[t][None], state,
            np.asarray([totals[t]], np.int32))
        audio = np.asarray(audio)[0]
        if np.all(vec["pcm"][t] == 0.0):
            assert np.all(audio == 0.0), f"NOTONES t={t}: non-silence"
            tones += 1
        else:
            worst = min(worst, snr_db(vec["pcm"][t], audio))
    print(f"notones_{codec:16s} worst {worst:6.1f} dB  "
          f"(+{tones} exact-silence frames)", flush=True)
    return worst


def audit_invalid_lane():
    """Invalid-lane config pin: corrupt the LAST frame of one channel (bit
    value 2). Required on-TPU semantics (mbe_result.h:18-42, vectorized in
    pipeline.step): corrupted lane renders exact silence with status -2 and
    its state rolls back to the pre-frame value; every other lane's PCM is
    bit-identical to the clean run."""
    vec = np.load(os.path.join(VEC, "e2e_imbe7200.npz"))
    frames = vec["frames"].copy()
    T, C = frames.shape[:2]
    ch = 3
    bad = frames.copy()
    bad[T - 1, ch, 0, 0] = 2

    def run(fr, s):
        return pipeline.run_sequence("imbe7200", fr, s, unroll=unroll)

    run = jax.jit(run)
    s0 = st.init_state(C, rng_seed=vec["seeds"])
    st_clean, pcm_clean, res_clean = run(frames, s0)
    st_bad, pcm_bad, res_bad = run(bad, s0)
    pcm_clean, pcm_bad = np.asarray(pcm_clean), np.asarray(pcm_bad)

    assert np.all(pcm_bad[T - 1, ch] == 0.0), "invalid lane not silenced"
    status = np.asarray(res_bad["status"])
    assert status[T - 1, ch] == -2
    assert (status == 0).sum() == T * C - 1, "spurious invalid statuses"
    mask = np.arange(C) != ch
    np.testing.assert_array_equal(pcm_bad[:, mask], pcm_clean[:, mask],
                                  err_msg="invalid lane leaked into others")
    np.testing.assert_array_equal(pcm_bad[:T - 1, ch], pcm_clean[:T - 1, ch])
    # state rollback: corrupted lane's state == state after T-1 clean frames
    st_mid, _, _ = run(frames[:T - 1], s0)
    for leaf_bad, leaf_mid in zip(jax.tree.leaves(st_bad),
                                  jax.tree.leaves(st_mid)):
        np.testing.assert_array_equal(np.asarray(leaf_bad)[..., ch],
                                      np.asarray(leaf_mid)[..., ch])
    print("invalid_lane             exact silence + status -2 + rollback OK",
          flush=True)


def main():
    prec = os.environ.get("MBE_TPU_FFT_PRECISION", "high")
    print(f"backend={jax.devices()[0].platform} fft_precision={prec} "
          f"unroll={unroll}")
    worst = np.inf
    for codec in ("imbe7200", "imbe7100", "ambe2450", "ambe2400"):
        for suffix, soft in (("", False), ("_soft", True)):
            worst = min(worst, audit(f"e2e_{codec}{suffix}", codec, soft))
        worst = min(worst, audit(f"long_{codec}", codec, False))
    for codec in ("ambe2450", "ambe2400"):
        worst = min(worst, audit_notones(codec))
    audit_invalid_lane()
    print(f"GLOBAL worst per-frame SNR: {worst:.1f} dB")


if __name__ == "__main__":
    main()
