"""Frame descrambling (demodulation) PRNG, vectorized via affine jumps.

The reference generates pr[k+1] = (173*pr[k] + 13849) mod 2^16 sequentially
per frame (ambe_common.c:86-92, imbe7200x4400.c:650-656). Affine LCGs
compose, so pr[k] = (A[k]*pr[0] + B[k]) mod 2^16 with precomputed A/B jump
tables (tables.npz: demod_prng_A/B) — the whole keystream for a batch of
frames is one elementwise expression, no scan.
"""

import jax.numpy as jnp

from ..tables import T


def prng_bits(seed, count):
    """Keystream bits pr[1..count]>>15 for a batch of seeds.

    Args:
      seed: [...] int32, pr[0] value (already multiplied by 16 by callers).
      count: static int, number of keystream bits (23 for AMBE, 114 for
        IMBE 7200, 100 for IMBE 7100).
    Returns:
      [..., count] int32 in {0,1} — bit k is pr[k+1] >> 15.
    """
    A = jnp.asarray(T.demod_prng_A[1:count + 1]).astype(jnp.uint32)
    B = jnp.asarray(T.demod_prng_B[1:count + 1]).astype(jnp.uint32)
    s = seed.astype(jnp.uint32)[..., None]
    pr = (A * s + B) & jnp.uint32(0xFFFF)
    return (pr >> 15).astype(jnp.int32)
