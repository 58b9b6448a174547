"""Frame descrambling (demodulation) PRNG, vectorized via affine jumps.

The reference generates pr[k+1] = (173*pr[k] + 13849) mod 2^16 sequentially
per frame (ambe_common.c:86-92, imbe7200x4400.c:650-656). Affine LCGs
compose, so pr[k] = (A[k]*pr[0] + B[k]) mod 2^16 with precomputed A/B jump
tables (tables.npz: demod_prng_A/B) — the whole keystream for a batch of
frames is one elementwise expression, no scan.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import T


def prng_keywords(seed, widths):
    """Keystream packed into one int32 word per demodulated row.

    The decoders XOR keystream bit k+m into column (width-1-m) of row words
    (the C applies pr MSB-column-first, ambe_common.c:94-99). Building the
    whole keystream as packed words keeps the hard frame path lane-dense:
    one [.., total]@[total, nrows] exact-f32 matmul instead of [.., width]
    bit planes per row.

    Args:
      seed: [C] int32 pr[0] (already multiplied by 16 by callers).
      widths: static tuple of per-row bit widths (e.g. (23,23,23,15,15,15)).
    Returns:
      [len(widths), C] int32 key words (bit j of word r = pr bit
      offset_r + (width_r-1-j)) — channel-minor like the packed rows.
    """
    total = sum(widths)
    W = np.zeros((len(widths), total), np.float32)
    k = 0
    for r, w in enumerate(widths):
        for m in range(w):
            W[r, k + m] = float(1 << (w - 1 - m))
        k += w
    bits = prng_bits(seed, total).astype(jnp.float32)
    words = jnp.matmul(jnp.asarray(W), bits,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    return words.astype(jnp.int32)


def prng_bits(seed, count):
    """Keystream bits pr[1..count]>>15 for a batch of seeds.

    Args:
      seed: [C] int32, pr[0] value (already multiplied by 16 by callers).
      count: static int, number of keystream bits (23 for AMBE, 114 for
        IMBE 7200, 100 for IMBE 7100).
    Returns:
      [count, C] int32 in {0,1} — bit k is pr[k+1] >> 15 (channel-minor).
    """
    A = jnp.asarray(T.demod_prng_A[1:count + 1]).astype(jnp.uint32)[:, None]
    B = jnp.asarray(T.demod_prng_B[1:count + 1]).astype(jnp.uint32)[:, None]
    s = seed.astype(jnp.uint32)[None, :]
    pr = (A * s + B) & jnp.uint32(0xFFFF)
    return (pr >> 15).astype(jnp.int32)
