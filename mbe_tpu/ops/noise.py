"""Noise generators: unvoiced LCG (with affine jump) and Java-Random
comfort noise — both as pure per-channel state transforms.

Unvoiced LCG (mbe_unvoiced_fft.c:277-341): x' = (171x + 11213) mod 53125.
The reference steps it 160x per frame; we use precomputed jump tables
(lcg_A/lcg_B) to emit all samples in parallel: state_{n+k} = A[k]*state_n +
B[k] mod 53125. Products are < 53125^2 < 2^32, exact in uint32.

Comfort noise (mbe_adaptive.c:51-130): java.util.Random's 48-bit LCG
seed' = (seed*0x5DEECE66D + 0xB) mod 2^48, output = top 24 bits mapped to
uniform [-1,1) * gain. Implemented with three 16-bit limbs in uint32 lanes
(JAX x64 stays disabled) and per-sample affine jump tables, so all 160
samples of a frame are produced in one fully-parallel elementwise pass —
exact 48-bit arithmetic, no scan.
"""

import jax
import numpy as np
import jax.numpy as jnp

from ..tables import T

LCG_M = 53125
LCG_DEFAULT_SEED = 3147.0
NOISE_OVERLAP = 96
FFT_SIZE = 256

# Java Random constants split into 16-bit limbs (mbe_adaptive.c:19-21).
_JMULT = 0x5DEECE66D
_JM0 = _JMULT & 0xFFFF
_JM1 = (_JMULT >> 16) & 0xFFFF
_JM2 = (_JMULT >> 32) & 0xFFFF
_JADD = 0xB


def lcg_block(seed_int, count=160):
    """LCG samples and final state via affine jump.

    Args:
      seed_int: [C] uint32/int32 current LCG state (already mod 53125).
      count: static int <= 160.
    Returns:
      (samples [count, C] int32 — value BEFORE each update, next_state [C]).
    """
    A = jnp.asarray(T.lcg_A[:count]).astype(jnp.uint32)[:, None]
    B = jnp.asarray(T.lcg_B[:count]).astype(jnp.uint32)[:, None]
    s = seed_int.astype(jnp.uint32)[None, :]
    samples = (A * s + B) % jnp.uint32(LCG_M)
    a_n = jnp.uint32(int(T.lcg_A[count]))
    b_n = jnp.uint32(int(T.lcg_B[count]))
    next_state = (a_n * seed_int.astype(jnp.uint32) + b_n) % jnp.uint32(LCG_M)
    return samples.astype(jnp.int32), next_state.astype(jnp.int32)


def generate_noise_with_overlap(noise_seed, noise_prev_seed, prime_value):
    """Batched mbe_generate_noise_with_overlap (mbe_unvoiced_fft.c:305-341).

    The reference carries the 96-float overlap tail in mbe_parms
    (mbelib.h:136); but that tail is buffer[160:256] = LCG samples 64..159
    of the seed the PREVIOUS warm frame started from (mbe_unvoiced_fft.c:
    330-338) — a pure function of one scalar. Carrying that scalar
    (`noise_prev_seed`, <0 = overlap-is-zeros) instead of the array saves
    380 bytes per Parms copy per channel; the overlap is re-expanded here
    with the same jump tables (identical A/B entries -> identical uint32
    products -> bit-exact).

    Args:
      noise_seed: [C] float32 (LCG state as float; < 0 means cold start).
      noise_prev_seed: [C] float32 — seed whose samples 64..159 form the
        overlap region (< 0 means the overlap is all zeros, the state right
        after a cold start).
      prime_value: [C] float32 — state to prime with on cold start (3147 by
        default, or seed%53125 after set_rng_seed; mbe_unvoiced_fft.c:313-321).
    Returns:
      (buffer [256, C] f32, new_seed [C] f32, new_prev_seed [C] f32).

    Cold-start lanes (seed < 0) emit all-zero buffers and prime the seed.
    """
    cold = noise_seed < 0.0

    state = noise_seed.astype(jnp.int32) % LCG_M  # safe for warm lanes
    samples, next_state = lcg_block(jnp.maximum(state, 0), count=160)

    # overlap[j] = sample 64+j of the previous seed (mbe_unvoiced_fft.c:330)
    pA = jnp.asarray(T.lcg_A[64:160]).astype(jnp.uint32)[:, None]
    pB = jnp.asarray(T.lcg_B[64:160]).astype(jnp.uint32)[:, None]
    ps = (jnp.maximum(noise_prev_seed, 0.0).astype(jnp.uint32)
          % jnp.uint32(LCG_M))[None, :]
    overlap = ((pA * ps + pB) % jnp.uint32(LCG_M)).astype(jnp.float32)
    overlap = jnp.where((noise_prev_seed < 0.0)[None, :], 0.0, overlap)

    warm_buffer = jnp.concatenate(
        [overlap, samples.astype(jnp.float32)], axis=0)  # [256, C]

    buffer = jnp.where(cold[None, :], 0.0, warm_buffer)
    # after a cold start the overlap region is zeros -> sentinel; after a
    # warm frame the next overlap is this frame's samples 64..159 -> the
    # seed we just consumed.
    new_prev_seed = jnp.where(cold, -1.0, noise_seed)
    new_seed = jnp.where(cold, prime_value, next_state.astype(jnp.float32))
    return buffer, new_seed, new_prev_seed


def java_random_init(seed_u32):
    """Java Random setSeed: state = (seed ^ 0x5DEECE66D) & 2^48-1, as three
    16-bit limbs [3, C] uint32 (mbe_adaptive.c:33-38). Zero seed maps to
    0x6d25357b first (mbe_setThreadRngSeed, mbelib.c:174-180)."""
    seed = jnp.where(seed_u32 == 0, jnp.uint32(0x6D25357B), seed_u32)
    s = seed.astype(jnp.uint32)
    s0 = (s & 0xFFFF) ^ jnp.uint32(_JM0)
    s1 = ((s >> 16) & 0xFFFF) ^ jnp.uint32(_JM1)
    s2 = jnp.zeros_like(s) ^ jnp.uint32(_JM2)  # seed's bits 32..47 are 0
    return jnp.stack([s0, s1, s2], axis=0)


def _java_step(limbs):
    """One Java Random LCG step on 16-bit limb state [3, C] uint32.

    Exact 48-bit arithmetic via 16x16 partial products (each < 2^32) with
    explicit carry propagation; the top limb only needs mod 2^16 so uint32
    wraparound in its sum is harmless.
    """
    s0 = limbs[0]
    s1 = limbs[1]
    s2 = limbs[2]
    m0, m1, m2 = jnp.uint32(_JM0), jnp.uint32(_JM1), jnp.uint32(_JM2)

    p00 = s0 * m0
    t0 = p00 + jnp.uint32(_JADD)
    r0 = t0 & 0xFFFF
    c0 = t0 >> 16

    p01 = s0 * m1
    p10 = s1 * m0
    t1 = (p01 & 0xFFFF) + (p10 & 0xFFFF) + c0
    r1 = t1 & 0xFFFF
    c1 = (t1 >> 16) + (p01 >> 16) + (p10 >> 16)

    t2 = s0 * m2 + s1 * m1 + s2 * m0 + c1
    r2 = t2 & 0xFFFF
    return jnp.stack([r0, r1, r2], axis=0)


def java_next_bits24(limbs):
    """(new_limbs, value) — next(24) = top 24 bits of the 48-bit state."""
    new = _java_step(limbs)
    val = (new[2] << 8) | (new[1] >> 8)
    return new, val


def _java_jump_tables(n):
    """Affine jump constants for the Java LCG: state_k = A_k*state + B_k
    mod 2^48, as 16-bit limb arrays [n, 3] (k = 1..n)."""
    A = np.zeros((n, 3), np.uint32)
    B = np.zeros((n, 3), np.uint32)
    a, b = 1, 0
    mask = (1 << 48) - 1
    for k in range(n):
        a = (a * _JMULT) & mask
        b = (b * _JMULT + _JADD) & mask
        A[k] = [a & 0xFFFF, (a >> 16) & 0xFFFF, (a >> 32) & 0xFFFF]
        B[k] = [b & 0xFFFF, (b >> 16) & 0xFFFF, (b >> 32) & 0xFFFF]
    return A, B


_JUMP_A, _JUMP_B = _java_jump_tables(160)


def comfort_noise(limbs, n=160):
    """160 comfort-noise samples + advanced RNG state
    (mbe_synthesizeComfortNoisef, mbe_adaptive.c:117-131).

    The sequential 160-step Java LCG is replaced by precomputed affine
    jumps: state_k = A_k*state + B_k mod 2^48, evaluated for all k in
    parallel with exact 16-bit-limb uint32 arithmetic (the same carry
    scheme as _java_step, generalized to 3x3 partial products).

    Args: limbs [3, C] uint32 Java-Random state.
    Returns: (samples [n, C] f32, new_limbs [3, C]).
    """
    assert n <= 160
    a = jnp.asarray(_JUMP_A[:n])  # [n, 3]
    b = jnp.asarray(_JUMP_B[:n])
    s0 = limbs[0][None, :]  # [1, C] broadcasts against [n, 1]
    s1 = limbs[1][None, :]
    s2 = limbs[2][None, :]
    a0, a1, a2 = a[:, 0][:, None], a[:, 1][:, None], a[:, 2][:, None]
    b0, b1, b2 = b[:, 0][:, None], b[:, 1][:, None], b[:, 2][:, None]

    p00 = a0 * s0
    t0 = p00 + b0
    c0 = t0 >> 16
    p01 = a0 * s1
    p10 = a1 * s0
    t1 = (p01 & 0xFFFF) + (p10 & 0xFFFF) + b1 + c0
    r1 = t1 & 0xFFFF
    c1 = (t1 >> 16) + (p01 >> 16) + (p10 >> 16)
    t2 = a0 * s2 + a1 * s1 + a2 * s0 + b2 + c1
    r2 = t2 & 0xFFFF

    val = (r2 << 8) | (r1 >> 8)  # next(24): top 24 bits of the 48-bit state
    gain = jnp.float32((0.003 * 32767.0) / 7.0)
    u = (val.astype(jnp.float32) / jnp.float32(16777216.0)) * 2.0 - 1.0
    samples = u * gain

    r0_last = t0[n - 1] & 0xFFFF
    new_limbs = jnp.stack([r0_last, r1[n - 1], r2[n - 1]], axis=0)
    return samples, new_limbs
