"""Pallas TPU kernel: fused soft-decision ML ECC decode.

The XLA soft path (ops/ecc.py:_soft_decode + callers) materializes several
[C, ncw] intermediates in HBM per block (score, diffs, matches, key) —
ablation shows the soft decoders are HBM-bound, not matmul-bound (~0.83 ms
per Golay block at C=8192). This kernel keeps everything VMEM-resident per
128-channel block and reduces straight to the winning lexicographic key.

Three MXU matmuls per (channel-block, codeword-tile):
  A = [q | base]        @ [cwT        ; 1]   -> reliability score
  B = [h | hsum | 1]    @ [-2*cwdT ; 1 ; cwdsum] -> hamming diffs (received)
  Cm = [hd | hdsum | 1] @ same table          -> diffs vs hard-decode output
matches == (Cm == 0), exactly the reference's matches-hard-output flag
(ecc.c:54-67), computed without any cross-lane compare of packed words.

The int32 key replicates ops/ecc.py exactly:
  golay:   (score << 17) | ((1 - matches) << 16) | (diffs << 12) | idx
  hamming: (score << 16) | ((1 - matches) << 15) | (diffs << 11) | idx
Because idx occupies the low bits, keys are unique, so a plain min over
codewords IS the reference argmin (first index wins ties), and the winning
index / diffs unpack from the key with shifts — no take_along_axis.

All matmul inputs are exact small integers in f32 (rel <= 255, codeword
bits, +-2 weights), so the scores are exact; int fields fit in 30 bits.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 128   # channels per grid block (sublane dimension)
KP = 32    # padded contraction width for the three small matmuls


def _kernel(q_ref, h_ref, hd_ref, tq_ref, th_ref, out_ref,
            *, shift_score, shift_match, shift_diff, cwt):
    j = pl.program_id(1)
    hp = jax.lax.Precision.HIGHEST
    score = jax.lax.dot_general(
        q_ref[...], tq_ref[...], (((1,), (0,)), ((), ())),
        precision=hp, preferred_element_type=jnp.float32)
    diffs = jax.lax.dot_general(
        h_ref[...], th_ref[...], (((1,), (0,)), ((), ())),
        precision=hp, preferred_element_type=jnp.float32)
    dhard = jax.lax.dot_general(
        hd_ref[...], th_ref[...], (((1,), (0,)), ((), ())),
        precision=hp, preferred_element_type=jnp.float32)
    nomatch = (dhard != 0.0).astype(jnp.int32)
    idx = (jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
           + j * np.int32(cwt))
    key = (score.astype(jnp.int32) * np.int32(1 << shift_score)
           + nomatch * np.int32(1 << shift_match)
           + diffs.astype(jnp.int32) * np.int32(1 << shift_diff)
           + idx)
    tile_min = jnp.min(key, axis=1, keepdims=True)  # [CB, 1]

    @pl.when(j == 0)
    def _init():
        out_ref[...] = tile_min

    @pl.when(j > 0)
    def _acc():
        out_ref[...] = jnp.minimum(out_ref[...], tile_min)


@functools.lru_cache(maxsize=8)
def _tables(codewords_key, data_lo, n):
    cw = _CW_REGISTRY[codewords_key].astype(np.float32)  # [ncw, n]
    ncw = cw.shape[0]
    # TQ rows: the n received-bit columns of q, then the folded base row.
    tq = np.zeros((KP, ncw), np.float32)
    tq[:n] = cw.T
    tq[n] = 1.0
    # TH rows: -2*cwd over the counted bits, then 1 (for hsum), then cwdsum.
    d = n - data_lo
    cwd = cw[:, data_lo:]
    th = np.zeros((KP, ncw), np.float32)
    th[:d] = -2.0 * cwd.T
    th[d] = 1.0
    th[d + 1] = cwd.sum(axis=1)
    return tq, th, ncw, d


_CW_REGISTRY = {}


def _soft_decode_pallas(bits, rel, hard_bits, codewords_key, data_lo, n,
                        shift_score, shift_match, shift_diff,
                        interpret=False):
    """Returns the winning int32 key [C] (idx in the low bits)."""
    tq_np, th_np, ncw, d = _tables(codewords_key, data_lo, n)
    c = bits.shape[0]
    cwt = min(ncw, 2048)  # codeword tile (VMEM: ~5 [CB, cwt] f32 arrays)

    relf = rel.astype(jnp.float32)
    bitsf = bits.astype(jnp.float32)
    q = relf * (1.0 - 2.0 * bitsf)                      # [C, n]
    base = jnp.sum(relf * bitsf, axis=-1, keepdims=True)
    Q = jnp.concatenate([q, base], axis=1)              # [C, n+1]
    Q = jnp.pad(Q, ((0, 0), (0, KP - (n + 1))))

    def hpack(b):
        h = b[:, data_lo:].astype(jnp.float32)          # [C, d]
        hs = jnp.sum(h, axis=-1, keepdims=True)
        out = jnp.concatenate([h, hs, jnp.ones((c, 1), jnp.float32)], axis=1)
        return jnp.pad(out, ((0, 0), (0, KP - (d + 2))))

    H = hpack(bits)
    HD = hpack(hard_bits)

    row_spec = pl.BlockSpec((CB, KP), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((KP, cwt), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((CB, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    key = pl.pallas_call(
        functools.partial(_kernel, shift_score=shift_score,
                          shift_match=shift_match, shift_diff=shift_diff,
                          cwt=cwt),
        interpret=interpret,
        grid=(c // CB, ncw // cwt),
        in_specs=[row_spec, row_spec, row_spec, tbl_spec, tbl_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c, 1), jnp.int32),
    )(Q, H, HD, jnp.asarray(tq_np), jnp.asarray(th_np))
    return key[:, 0]


def golay2312_soft_keys(bits, rel, hard_bits, codewords, interpret=False):
    """Winning keys for soft Golay(23,12). bits/rel/hard_bits [C, 23]."""
    _CW_REGISTRY["golay"] = codewords
    return _soft_decode_pallas(bits, rel, hard_bits, "golay", 11, 23,
                               17, 16, 12, interpret)


def hamming1511_soft_keys(bits, rel, hard_bits, codewords, variant7100,
                          interpret=False):
    """Winning keys for soft Hamming(15,11). bits/rel/hard_bits [C, 15]."""
    key = "ham7100" if variant7100 else "hamstd"
    _CW_REGISTRY[key] = codewords
    return _soft_decode_pallas(bits, rel, hard_bits, key, 0, 15,
                               16, 15, 11, interpret)
