"""Pallas TPU kernel: fused soft-decision ML ECC decode.

The XLA soft path (ops/ecc.py:_soft_decode + callers) materializes the
[C, ncw] score and diff matmul products in HBM before the fused
key-build/argmin kernel reads them back — ~1.6 GB of traffic per Golay
decode at C=8192x3. This kernel keeps everything VMEM-resident per
128-channel block and reduces straight to the winning lexicographic key,
so HBM sees only the [C, n] inputs and the [C] keys.

Two MXU matmuls per (channel-block, codeword-tile), bf16 x bf16 -> f32:
  score = q @ cwT + base     (q = rel*(1-2b): integers <= 255, exact bf16)
  diffs = [h | hsum | 1] @ [-2*cwdT ; 1 ; cwdsum]
  dhard = same with the hard-decode output; matches == (dhard == 0),
exactly the reference's matches-hard-output flag (ecc.c:54-67). Every
matmul operand is an integer of magnitude <= 255 (exact in bf16's 8
significand bits) and accumulation is f32 (sums < 2^24), so the scores are
exact — one MXU pass instead of the 6-pass f32-HIGHEST decomposition.

The int32 key replicates ops/ecc.py exactly:
  golay:   (score << 17) | ((1 - matches) << 16) | (diffs << 12) | idx
  hamming: (score << 16) | ((1 - matches) << 15) | (diffs << 11) | idx
Because idx occupies the low bits, keys are unique, so a plain min over
codewords IS the reference argmin (first index wins ties), and the winning
index / diffs unpack from the key with shifts — no take_along_axis.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KP = 32    # padded contraction width for the small matmuls


def _tiles(c, ncw):
    """(channel-block, codeword-tile) sizes; env-tunable for sweeps.

    Read at trace time so a fresh jit closure (tools/soft_sweep.py builds
    one per config) picks up MBE_TPU_SOFT_CB / MBE_TPU_SOFT_CWT."""
    # defaults from the round-3 tile sweep (tools/soft_sweep.py, real TPU,
    # 2026-08-18): CB=256 cwt=4096 measured 3.51M vs 3.34M f/s for the
    # 2048/128 round-2 tiles on soft imbe7200 at C=16384. CB falls back to
    # 128 when 256 doesn't divide the flattened batch (the _use_pallas_soft
    # gate only guarantees a multiple of 128).
    cb_env = os.environ.get("MBE_TPU_SOFT_CB")
    cb = int(cb_env) if cb_env else (256 if c % 256 == 0 else 128)
    cwt = min(ncw, int(os.environ.get("MBE_TPU_SOFT_CWT", "4096")))
    if c % cb or ncw % cwt:
        raise ValueError(f"tile sizes must divide shapes: C={c} CB={cb}, "
                         f"ncw={ncw} cwt={cwt}")
    return cb, cwt


def _kernel(q_ref, base_ref, h_ref, hd_ref, tq_ref, th_ref, out_ref,
            *, shift_score, shift_match, shift_diff, cwt):
    j = pl.program_id(1)
    score = jax.lax.dot_general(
        q_ref[...], tq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + base_ref[...]
    diffs = jax.lax.dot_general(
        h_ref[...], th_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dhard = jax.lax.dot_general(
        hd_ref[...], th_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
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
    # TQ rows: the n received-bit columns of q (base is added separately —
    # it can exceed bf16's exact-integer range).
    tq = np.zeros((KP, ncw), np.float32)
    tq[:n] = cw.T
    # TH rows: -2*cwd over the counted bits, then 1 (for hsum), then cwdsum.
    d = n - data_lo
    cwd = cw[:, data_lo:]
    th = np.zeros((KP, ncw), np.float32)
    th[:d] = -2.0 * cwd.T
    th[d] = 1.0
    th[d + 1] = cwd.sum(axis=1)
    return tq.astype(np.dtype(jnp.bfloat16)), th.astype(np.dtype(jnp.bfloat16)), ncw, d


_CW_REGISTRY = {}


def _soft_decode_pallas(bits, rel, hard_bits, codewords_key, data_lo, n,
                        shift_score, shift_match, shift_diff,
                        interpret=False):
    """Returns the winning int32 key [C] (idx in the low bits)."""
    tq_np, th_np, ncw, d = _tables(codewords_key, data_lo, n)
    c = bits.shape[0]
    CB, cwt = _tiles(c, ncw)  # VMEM: ~4 [CB, cwt] f32 arrays

    relf = rel.astype(jnp.float32)
    bitsf = bits.astype(jnp.float32)
    q = (relf * (1.0 - 2.0 * bitsf)).astype(jnp.bfloat16)   # [C, n] exact
    base = jnp.sum(relf * bitsf, axis=-1, keepdims=True)    # [C, 1] f32
    Q = jnp.pad(q, ((0, 0), (0, KP - n)))

    def hpack(b):
        h = b[:, data_lo:].astype(jnp.float32)          # [C, d]
        hs = jnp.sum(h, axis=-1, keepdims=True)
        out = jnp.concatenate([h, hs, jnp.ones((c, 1), jnp.float32)], axis=1)
        return jnp.pad(out, ((0, 0), (0, KP - (d + 2)))).astype(jnp.bfloat16)

    H = hpack(bits)
    HD = hpack(hard_bits)

    row_spec = pl.BlockSpec((CB, KP), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    base_spec = pl.BlockSpec((CB, 1), lambda i, j: (i, 0),
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
        in_specs=[row_spec, base_spec, row_spec, row_spec, tbl_spec,
                  tbl_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c, 1), jnp.int32),
    )(Q, base, H, HD, jnp.asarray(tq_np), jnp.asarray(th_np))
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
