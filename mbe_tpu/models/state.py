"""Batched per-channel codec state (the TPU equivalent of `mbe_parms`).

The reference keeps one caller-owned `mbe_parms` triplet per stream plus a
handful of thread-local RNG singletons (mbelib.h:88-139, SURVEY.md L4). Here
all of that becomes one pytree of batched arrays — C concurrent channels —
that is threaded functionally through every frame step and scanned over
time. It is plain data: trivially snapshottable, shardable along C, and
donate-able.

Layout (round 3): the channel axis is MINOR — scalars are [C], per-band
arrays are [57, C], the WOLA buffer [128, C]. On TPU the minor-most dim
maps to the 128-wide vector lanes, so [C, 57] arrays padded 57 -> 128
ran every elementwise op at ~45% lane occupancy; with channels in lanes
the band math runs dense (57 -> 64 sublanes instead). Bit-exact: only
array orientation changes, not arithmetic.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import noise
from ..tables import T

MAX_L = 56
NBANDS = 57  # index 0 unused for most arrays, matching the reference layout
FRAME = 160

MUTING_THRESHOLD_IMBE = np.float32(0.0875)
MUTING_THRESHOLD_AMBE = np.float32(0.096)
MAX_FRAME_REPEATS = 4
DEFAULT_LOCAL_ENERGY = np.float32(75000.0)
DEFAULT_AMPLITUDE_THRESHOLD = 20480


def _field(**kw):
    return dataclasses.field(**kw)


@partial(jax.tree_util.register_dataclass,
         data_fields=["w0", "L", "K", "Vl", "Ml", "log2Ml", "PHIl", "PSIl",
                      "gamma", "tonePhase", "swn", "localEnergy",
                      "amplitudeThreshold", "errorRate", "errorCountTotal",
                      "errorCount4", "repeatCount", "mutingThreshold",
                      "previousUw", "noiseSeed", "noisePrevSeed"],
         meta_fields=[])
@dataclasses.dataclass
class Parms:
    """Batched mirror of mbe_parms (mbelib.h:88-139). Channel axis minor:
    scalars [C], band arrays [57, C], WOLA buffer [128, C]."""

    w0: jax.Array            # [C] f32
    L: jax.Array             # [C] i32
    K: jax.Array             # [C] i32
    Vl: jax.Array            # [57, C] i32
    Ml: jax.Array            # [57, C] f32
    log2Ml: jax.Array        # [57, C] f32
    PHIl: jax.Array          # [57, C] f32
    PSIl: jax.Array          # [57, C] f32
    gamma: jax.Array         # [C] f32
    tonePhase: jax.Array     # [C] u32
    swn: jax.Array           # [C] u32 (tone phase 1 accumulator)
    localEnergy: jax.Array   # [C] f32
    amplitudeThreshold: jax.Array  # [C] i32
    errorRate: jax.Array     # [C] f32
    errorCountTotal: jax.Array     # [C] i32
    errorCount4: jax.Array   # [C] i32
    repeatCount: jax.Array   # [C] i32
    mutingThreshold: jax.Array     # [C] f32
    # Unvoiced-continuity diet (round 4): mbe_parms carries previousUw[256]
    # + noiseOverlap[96] per copy (mbelib.h:132-136), but (a) the WOLA only
    # ever reads previousUw[128:256] (prev_idx = n+128 clipped to <256,
    # mbe_unvoiced_fft.c:398-404), so only that half is stored here, and
    # (b) noiseOverlap is a pure LCG function of the seed that produced it
    # (buffer tail = samples 64..159 from that seed, mbe_unvoiced_fft.c:
    # 330-338), so one scalar `noisePrevSeed` replaces the 96-float array
    # (<0 = overlap-is-zeros, i.e. post-cold-start). Both are bit-exact
    # reformulations; they cut the carried noise block from 1412 to 520
    # bytes per Parms copy. The copies themselves must stay per-Parms:
    # repeat/erasure lanes genuinely resurrect stale continuity (useLast
    # copies prev's seed/overlap into cur, mbelib.c:346-359), so cur/prev/
    # enh diverge at real step boundaries and cannot share one buffer.
    previousUw: jax.Array    # [128, C] f32 = mbe_parms.previousUw[128:256]
    noiseSeed: jax.Array     # [C] f32 (<0 = cold start sentinel)
    noisePrevSeed: jax.Array  # [C] f32 seed that generated the overlap (<0 = zeros)


@partial(jax.tree_util.register_dataclass,
         data_fields=["cur", "prev", "enh", "comfort_rng", "lcg_prime"],
         meta_fields=[])
@dataclasses.dataclass
class ChannelState:
    """Full decoder state: the parms triplet plus per-channel RNG state.

    comfort_rng replaces the thread-local Java-Random (mbe_adaptive.c:29);
    lcg_prime replaces the thread-local unvoiced cold-start override
    (mbe_unvoiced_fft.c:29-30).
    """

    cur: Parms
    prev: Parms
    # enh (prev_mp_enhanced) may be None for IMBE-only streams: the IMBE
    # FSM ends every step with enh == cur (imbe7200x4400.c:856 moves cur
    # into prev_mp_enhanced right after synthesis), so carrying a separate
    # copy through a scan doubles its HBM traffic for nothing. The AMBE
    # FSMs genuinely diverge (tone/erasure lanes leave enh untouched) and
    # require a real enh.
    enh: Parms | None
    comfort_rng: jax.Array  # [3, C] u32 (16-bit limbs of Java Random state)
    lcg_prime: jax.Array    # [C] f32 (unvoiced LCG cold-start value)


def _default_parms(c: int, ambe: bool) -> Parms:
    """JMBE defaults: IMBE (mbelib.c:368-409) or AMBE W124
    (ambe_common.c:192-229)."""
    f32 = jnp.float32
    if ambe:
        w0 = jnp.full((c,), float(T.default_w0[0]), f32)
        L = jnp.full((c,), 15, jnp.int32)
        K = jnp.zeros((c,), jnp.int32)
        mut = jnp.full((c,), MUTING_THRESHOLD_AMBE, f32)
    else:
        w0 = jnp.full((c,), float(T.default_w0[2]), f32)
        L = jnp.full((c,), 39, jnp.int32)
        K = jnp.full((c,), 12, jnp.int32)
        mut = jnp.full((c,), MUTING_THRESHOLD_IMBE, f32)
    return Parms(
        w0=w0, L=L, K=K,
        Vl=jnp.zeros((NBANDS, c), jnp.int32),
        Ml=jnp.ones((NBANDS, c), f32),
        log2Ml=jnp.zeros((NBANDS, c), f32),
        PHIl=jnp.zeros((NBANDS, c), f32),
        PSIl=jnp.zeros((NBANDS, c), f32),
        gamma=jnp.zeros((c,), f32),
        tonePhase=jnp.zeros((c,), jnp.uint32),
        swn=jnp.zeros((c,), jnp.uint32),
        localEnergy=jnp.full((c,), DEFAULT_LOCAL_ENERGY, f32),
        amplitudeThreshold=jnp.full((c,), DEFAULT_AMPLITUDE_THRESHOLD, jnp.int32),
        errorRate=jnp.zeros((c,), f32),
        errorCountTotal=jnp.zeros((c,), jnp.int32),
        errorCount4=jnp.zeros((c,), jnp.int32),
        repeatCount=jnp.zeros((c,), jnp.int32),
        mutingThreshold=mut,
        previousUw=jnp.zeros((128, c), f32),
        noiseSeed=jnp.full((c,), -1.0, f32),
        noisePrevSeed=jnp.full((c,), -1.0, f32),
    )


def init_state(channels: int, rng_seed=None, carry_enh: bool = True
               ) -> ChannelState:
    """mbe_initMbeParms for a batch of channels (+ RNG state).

    rng_seed: optional [C] uint32 per-channel seed, the equivalent of
    mbe_setThreadRngSeed (mbelib.c:173-181); None leaves the RNGs on their
    unseeded defaults (Java Random 0x12345678 and LCG 3147).
    carry_enh: pass False for IMBE-only streams to drop the redundant
    prev_mp_enhanced copy from the carried state (enh == cur at every IMBE
    step boundary; measured 1.035x end-to-end at C=32768). AMBE steps
    require carry_enh=True.
    """
    p = _default_parms(channels, ambe=False)
    if rng_seed is None:
        comfort = noise.java_random_init(
            jnp.full((channels,), 0x12345678, jnp.uint32))
        lcg_prime = jnp.full((channels,), noise.LCG_DEFAULT_SEED, jnp.float32)
    else:
        seed = jnp.asarray(rng_seed, jnp.uint32)
        seed = jnp.broadcast_to(seed, (channels,))
        seed = jnp.where(seed == 0, jnp.uint32(0x6D25357B), seed)
        comfort = noise.java_random_init(seed)
        lcg_prime = (seed % jnp.uint32(noise.LCG_M)).astype(jnp.float32)
    return ChannelState(cur=p, prev=jax.tree.map(jnp.copy, p),
                        enh=jax.tree.map(jnp.copy, p) if carry_enh else None,
                        comfort_rng=comfort, lcg_prime=lcg_prime)


def ambe_default_parms_like(p: Parms) -> Parms:
    """mbe_initAmbeParms_common values with p's batch shape
    (ambe_common.c:192-229)."""
    c = p.w0.shape[0]
    return _default_parms(c, ambe=True)


def select(mask, a: Parms, b: Parms) -> Parms:
    """Lane-wise select: mask [C] -> a where True else b, per leaf.
    The channel axis is minor, so the mask broadcasts on LEADING axes."""
    def sel(x, y):
        m = mask.reshape((1,) * (x.ndim - mask.ndim) + mask.shape)
        return jnp.where(m, x, y)
    return jax.tree.map(sel, a, b)


def select_tree(mask, a, b):
    """Lane-wise select over arbitrary matching pytrees (channel minor)."""
    def sel(x, y):
        m = mask.reshape((1,) * (x.ndim - mask.ndim) + mask.shape)
        return jnp.where(m, x, y)
    return jax.tree.map(sel, a, b)


def select_cases(cases, default):
    """First-match-wins lane select over matching pytrees.

    select_cases([(m1, t1), (m2, t2)], d) computes, per lane, t1 where m1,
    else t2 where m2, else d — bit-identical to the nested form
    select(m1, t1, select(m2, t2, d)) — but built LEAF-wise with the masks
    made disjoint first, so that:

    - a case whose leaf IS the default's leaf (same array object — the
      dataclasses.replace sharing pattern every FSM branch uses) costs
      nothing: where(m, x, x) == x is dropped before tracing, not left
      for XLA to maybe-simplify;
    - cases reading the same source leaf merge into ONE where() with
      OR'd (disjoint) masks.

    The FSM state commits are 3-deep chains of mostly-shared copies over
    the whole [*, C] Parms triplet, which made select_select fusions
    ~0.9 ms/step of the ambe2400 xprof budget at C=32768; the leaf-wise
    rebuild removes most of that traffic (see docs/PERFORMANCE.md).
    Dropping/merging is exact even for NaN/Inf lanes (no arithmetic, only
    selects on identical values); the disjoint rewrite preserves the
    nested form's shadowing (an earlier case wins every lane it covers).
    """
    taken = None
    disjoint = []
    for m, t in cases:
        eff = m if taken is None else (m & ~taken)
        taken = m if taken is None else (taken | m)
        disjoint.append((eff, t))
    leaves_d, treedef = jax.tree.flatten(default)
    case_leaves = [(eff, jax.tree.flatten(t)[0]) for eff, t in disjoint]
    out = []
    for i, dl in enumerate(leaves_d):
        by_src = []  # [(mask, src)] with distinct src objects
        for eff, lv in case_leaves:
            src = lv[i]
            if src is dl:
                continue
            for j, (m0, s0) in enumerate(by_src):
                if s0 is src:
                    by_src[j] = (m0 | eff, s0)
                    break
            else:
                by_src.append((eff, src))
        expr = dl
        for m, src in by_src:
            mm = m.reshape((1,) * (src.ndim - m.ndim) + m.shape)
            expr = jnp.where(mm, src, expr)
        out.append(expr)
    return jax.tree.unflatten(treedef, out)


def erasure_parms(mp: Parms, continuity: Parms) -> Parms:
    """mbe_setAmbeErasureParms_common (ambe_common.c:231-260): W120 model
    with phase/noise continuity taken from `continuity`; error/repeat/muting
    fields keep mp's values."""
    c = mp.w0.shape[0]
    f32 = jnp.float32
    return dataclasses.replace(
        mp,
        swn=jnp.zeros((c,), jnp.uint32),
        tonePhase=jnp.zeros((c,), jnp.uint32),
        w0=jnp.zeros((c,), f32),
        L=jnp.full((c,), 9, jnp.int32),
        K=jnp.zeros((c,), jnp.int32),
        gamma=jnp.zeros((c,), f32),
        Ml=jnp.ones((NBANDS, c), f32),
        Vl=jnp.zeros((NBANDS, c), jnp.int32),
        log2Ml=jnp.zeros((NBANDS, c), f32),
        PHIl=continuity.PHIl,
        PSIl=continuity.PSIl,
        localEnergy=jnp.full((c,), DEFAULT_LOCAL_ENERGY, f32),
        amplitudeThreshold=jnp.full((c,), DEFAULT_AMPLITUDE_THRESHOLD, jnp.int32),
        noiseSeed=continuity.noiseSeed,
        noisePrevSeed=continuity.noisePrevSeed,
        previousUw=continuity.previousUw,
    )


def imbe_headroom_reset(mp: Parms) -> Parms:
    """imbe_reset_headroom_defaults (imbe7200x4400.c:56-81): default voice
    model, preserving error metrics and synthesis continuity state."""
    c = mp.w0.shape[0]
    f32 = jnp.float32
    return dataclasses.replace(
        mp,
        swn=jnp.zeros((c,), jnp.uint32),
        tonePhase=jnp.zeros((c,), jnp.uint32),
        w0=jnp.full((c,), float(T.default_w0[2]), f32),
        L=jnp.full((c,), 39, jnp.int32),
        K=jnp.full((c,), 12, jnp.int32),
        gamma=jnp.zeros((c,), f32),
        Vl=jnp.zeros((NBANDS, c), jnp.int32),
        Ml=jnp.ones((NBANDS, c), f32),
        log2Ml=jnp.zeros((NBANDS, c), f32),
        repeatCount=jnp.zeros((c,), jnp.int32),
        localEnergy=jnp.full((c,), DEFAULT_LOCAL_ENERGY, f32),
        amplitudeThreshold=jnp.full((c,), DEFAULT_AMPLITUDE_THRESHOLD, jnp.int32),
        mutingThreshold=jnp.full((c,), MUTING_THRESHOLD_IMBE, f32),
    )
