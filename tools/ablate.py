#!/usr/bin/env python3
"""Honest stage budget via ablation: monkeypatch one stage to a cheap
stand-in INSIDE the real jitted step and diff against the unablated step
time (isolated stage timing fuses differently and lies — see CLAUDE.md
perf notes). PCM is consumed in the scan carry so XLA cannot dead-code the
render.

Usage: python tools/ablate.py [codec] [channels] [steps]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.models import ambe, imbe, spectral, speech  # noqa: E402
from mbe_tpu.models import state as st  # noqa: E402
from mbe_tpu.ops import demod, ecc, enhance, noise, synth  # noqa: E402


def build(codec, channels, steps, soft=False):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))
    rel = (jax.device_put(rng.integers(0, 256, (channels, rows, cols),
                                       dtype=np.int32)) if soft else None)

    def body(carry, _):
        s, acc = carry
        s2, audio, res, _ = pipeline.step(codec, frame, s, soft_rel=rel)
        return (s2, acc + jnp.sum(audio)), 0

    return jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=steps)[0])


def _force(out):
    """Real completion gate: block_until_ready is unreliable over this
    tunnel (profiling.py docstring). Ablation DELTAS were always valid
    (the ~28 ms dispatch constant cancels in full-minus-ablated), but the
    absolute base ms/step carries const/steps — quote slope-based numbers
    (bench.py) for absolutes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)


def measure(fn, channels, steps, reps=3):
    _force(fn(st.init_state(channels)))
    best = np.inf
    for _ in range(reps):
        s0 = st.init_state(channels)
        jax.block_until_ready(s0)
        t0 = time.time()
        _force(fn(s0))
        best = min(best, (time.time() - t0) / steps)
    return best


# --- stage stand-ins (cheap, shape/dtype-preserving) -------------------------
# Every stand-in must be INPUT-DEPENDENT: a jnp.zeros stub is a literal
# constant that XLA folds into downstream multiplies and XORs, silently
# deleting parts of *other* stages (e.g. a zero noise buffer removes the
# unvoiced windowing too) and inflating the stubbed stage's apparent share.


def _bcast_minor(x, shape):
    """Cheap non-foldable filler: broadcast of an input row (channel-minor:
    the trailing axis is C, so take one leading row and broadcast)."""
    return jnp.broadcast_to(x.reshape(-1, x.shape[-1])[:1, :], shape)


ABLATIONS = {
    # NOTE: the hard frame paths call the *_packed variants + prng_keywords
    # (the bit-plane wrappers below them are the soft/API path) — stubbing
    # only the wrappers measures nothing on the hard path.
    "golay_hard": (ecc, "golay2312_hard_packed",
                   lambda word: (word.astype(jnp.int32),
                                 (word & 1).astype(jnp.int32))),
    "hamming_hard": (ecc, "hamming1511_hard_packed",
                     lambda block, variant7100=False: (
                         block.astype(jnp.int32),
                         (block & 1).astype(jnp.int32))),
    "demod_prng": (demod, "prng_keywords",
                   lambda seed, widths: _bcast_minor(
                       (seed & 1)[None, :], (len(widths),
                                             seed.shape[0])).astype(jnp.int32)),
    "param_decode": (imbe, "decode_imbe4400_parms",
                     lambda d, cur, prev: (cur, prev, d[0, :])),
    "spectral_update": (spectral, "spectral_update",
                        lambda cur_L, prev_L, prev_Ml, prev_log2Ml, Tl, *,
                        weight, cur_Ml, cur_log2Ml, **kw: (
                            cur_Ml + Tl, cur_log2Ml, prev_Ml, prev_log2Ml,
                            cur_L)),
    "enhance": (enhance, "spectral_amp_enhance",
                lambda w0, L, Ml: (Ml, jnp.sum(Ml * Ml, axis=0))),
    "smoothing": (enhance, "adaptive_smoothing",
                  lambda Ml, Vl, L, er, et, e4, le, at, rm0: (Ml, Vl, le, at)),
    "voiced": (synth, "render_voiced",
               lambda cw0, cMl, cVl, cPhi, pw0, pMl, pVl, pPhi, maxl:
               _bcast_minor(cMl, (160, cw0.shape[0]))),
    "unvoiced_fft": (synth, "unvoiced_fft",
                     lambda w0, L, Ml, Vl, puw, nb: (
                         _bcast_minor(Ml, (160, w0.shape[0])), puw)),
    "lcg_noise": (noise, "generate_noise_with_overlap",
                  lambda seed, prev_seed, prime: (
                      _bcast_minor(prev_seed[None, :],
                                   (256, seed.shape[0])),
                      seed, prev_seed)),
    "comfort": (noise, "comfort_noise",
                lambda limbs, n=160: (
                    _bcast_minor(limbs.astype(jnp.float32),
                                 (n, limbs.shape[-1])), limbs)),
    "phases": (synth, "update_phases",
               lambda w0, L, psi, phi, pw0, ppsi, nb, nuv: (psi, phi, ppsi)),
    # AMBE-only stages (no-ops on IMBE runs: the stubbed symbol is never
    # traced, so the ablated step compiles to the same graph as base)
    "ambe2450_decode": (ambe, "decode_ambe2450_parms",
                        lambda d, cur, prev, te: (cur, prev, d[0, :])),
    "ambe2400_decode": (ambe, "decode_ambe2400_parms",
                        lambda d, cur, prev: (cur, prev, d[0, :])),
    "tone_synth": (synth, "render_tone",
                   lambda tid, aid, swn, ph: (
                       _bcast_minor(ph.astype(jnp.float32)[None, :],
                                    (160, ph.shape[0])), swn, ph)),
}

# Soft-path stages (exhaustive-ML ECC). Identity passthrough is the ideal
# stand-in here: input-dependent (nothing folds), shape/dtype-exact, and it
# keeps real bits flowing to the decode stages downstream.
# Caveat (ADVICE r3): the synthesized error counts (rel[...,0] & 1) follow a
# different distribution than real soft-ECC diffs, so downstream FSM branch
# masks (erasure/repeat gates) see different lane mixes under ablation. All
# branches still compute on all lanes, so the timing skew is minor, but the
# ablated step is not byte-identical work to the real one — read soft-stage
# deltas with that in mind.
SOFT_ABLATIONS = {
    "golay_soft": (ecc, "golay2312_soft",
                   lambda bits, rel: (bits.astype(jnp.int32),
                                      (rel[..., 0] & 1).astype(jnp.int32))),
    "hamming_soft": (ecc, "hamming1511_soft",
                     lambda bits, rel, variant7100=False: (
                         bits.astype(jnp.int32),
                         (rel[..., 0] & 1).astype(jnp.int32))),
}


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    soft = codec.endswith("-soft")  # e.g. imbe7200-soft
    codec = codec.removesuffix("-soft")
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None

    base_fn = build(codec, channels, steps, soft=soft)
    t_base = measure(base_fn, channels, steps)
    print(f"BASE {codec}{' soft' if soft else ''} C={channels}: "
          f"{t_base*1e3:.3f} ms/step "
          f"({channels/t_base:,.0f} f/s)", flush=True)

    stages = dict(ABLATIONS)
    if soft:
        stages.update(SOFT_ABLATIONS)
    for name, (mod, attr, stub) in stages.items():
        if only and name not in only:
            continue
        orig = getattr(mod, attr)
        setattr(mod, attr, stub)
        try:
            fn = build(codec, channels, steps, soft=soft)
            t = measure(fn, channels, steps)
        finally:
            setattr(mod, attr, orig)
        # re-measure base back-to-back to control drift
        t_base2 = measure(base_fn, channels, steps)
        ref = min(t_base, t_base2)
        print(f"  -{name:16s}: {t*1e3:7.3f} ms/step  "
              f"saves {(ref-t)*1e3:6.3f} ms ({(ref-t)/ref*100:5.1f}%)  "
              f"[base now {t_base2*1e3:.3f}]", flush=True)


if __name__ == "__main__":
    main()
