"""Pallas TPU kernel: fused soft-decision ML ECC decode.

The XLA soft path (ops/ecc.py:_soft_decode + callers) materializes the
[C, ncw] score and diff matmul products in HBM before the fused
key-build/argmin kernel reads them back — ~1.6 GB of traffic per Golay
decode at C=8192x3. This kernel keeps everything VMEM-resident per
channel block and reduces straight to the winning lexicographic key,
so HBM sees only the [C, n] inputs and the [C] keys.

ONE MXU matmul per (channel-block, codeword-tile), bf16 x bf16 -> f32
(round 4; the round-3 kernel ran three). The int32 key replicates
ops/ecc.py exactly:
  golay:   (score << 17) | ((1 - matches) << 16) | (diffs << 12) | idx
  hamming: (score << 16) | ((1 - matches) << 15) | (diffs << 11) | idx
and factors as (score*2^s + diffs)*2^shift_diff + nomatch*2^shift_match
+ idx with s = shift_score - shift_diff = 5 for both codes. score and
diffs are both integer-linear in per-codeword tables, so

  hi = score*32 + diffs
     = [q | h | hsum | 1] @ [32*cw.T ; -2*cwd.T ; 1 ; cwdsum] + 32*base

is a single matmul: every operand is an integer of magnitude <= 255
(exact in bf16's 8 significand bits), every product <= 255*32 = 8160
(exact f32), and every accumulation < 2^18 (exact f32).

Round 5 (VERDICT r4 #2): the kernel's limiting resource is the VPU
epilogue over [CB, cwt], and two of its terms are row-constant or
single-column — so they moved OUT of the tile loop entirely:

- base (32 * sum rel*bits, row constant): min(key) distributes over a
  per-row constant, so the kernel reduces P = (hi - base)*2^sd + idx
  and the host adds base*2^sd once per channel.
- the matches-hard reward (nomatch bit): nomatch is 1 everywhere except
  the single column idx == idx_hard, so key = P + base*2^sd + 2^sm
  - 2^sm*[idx == idx_hard]. The full min is
      min( min_tile(P) + 2^sm , P[idx_hard] ) + base*2^sd,
  and P[idx_hard] = (scale*score_hard + diffs_hard - base)*2^sd
  + idx_hard is computable per channel OUTSIDE the kernel: both
  codebooks are linear and index-systematic, so the hard codeword's
  packed bits are an XOR-combination of 11/12 precomputed basis words,
  score_hard is a [C, n]-shaped mismatch sum, and diffs_hard a popcount
  (diffs compare candidates against the RECEIVED bits, so the hard
  candidate's diffs is its correction weight, not 0) — O(n) lane work
  vs O(ncw) epilogue work.

The per-element epilogue drops from (convert, mul, iota-compare,
mul-add nomatch, add base, add idx, min) to (convert, mul, add idx,
min). Keys are unique (idx in the low bits), so a plain min IS the
reference argmin (first index wins ties), and the winning index/diffs
unpack from the key with shifts — no take_along_axis.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _kernel(qh_ref, tc_ref, out_ref, *, shift_diff, cwt):
    j = pl.program_id(1)
    dot = jax.lax.dot_general(
        qh_ref[...], tc_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # exact ints, may be negative
    P = (dot.astype(jnp.int32) * np.int32(1 << shift_diff)
         + jax.lax.broadcasted_iota(jnp.int32, dot.shape, 1)
         + j * np.int32(cwt))
    tile_min = jnp.min(P, axis=1, keepdims=True)  # [CB, 1]

    @pl.when(j == 0)
    def _init():
        out_ref[...] = tile_min

    @pl.when(j > 0)
    def _acc():
        out_ref[...] = jnp.minimum(out_ref[...], tile_min)


@functools.lru_cache(maxsize=8)
def _tables(codewords_key, data_lo, n, scale):
    """Combined [KP, ncw] table for hi - base = score*scale + diffs - base
    (see module docstring); returns (table bf16, ncw, d, KP, basis) where
    basis[j] is the packed codeword of data word 1<<j (codebooks are
    linear + index-systematic, so cw_word(idx) = XOR of selected basis
    rows — used for the out-of-kernel hard-codeword term)."""
    cw = _CW_REGISTRY[codewords_key].astype(np.float32)  # [ncw, n]
    ncw = cw.shape[0]
    d = n - data_lo
    cwd = cw[:, data_lo:]
    kp = -(-(n + d + 2) // 8) * 8
    tc = np.zeros((kp, ncw), np.float32)
    tc[:n] = scale * cw.T                # x q rows
    tc[n:n + d] = -2.0 * cwd.T           # x h rows
    tc[n + d] = 1.0                      # x hsum
    tc[n + d + 1] = cwd.sum(axis=1)      # x 1
    packed = (cw.astype(np.int64) << np.arange(n)).sum(axis=1)
    assert packed[0] == 0  # linear code: data 0 -> all-zero codeword
    nb = ncw.bit_length() - 1
    basis = packed[1 << np.arange(nb)].astype(np.int32)
    return tc.astype(np.dtype(jnp.bfloat16)), ncw, d, kp, basis


_CW_REGISTRY = {}


def _soft_decode_pallas(bits, rel, idx_hard, codewords_key, data_lo, n,
                        shift_score, shift_match, shift_diff,
                        interpret=False):
    """Returns the winning int32 key [C] (idx in the low bits)."""
    scale = 1 << (shift_score - shift_diff)
    tc_np, ncw, d, kp, basis = _tables(codewords_key, data_lo, n, scale)
    c = bits.shape[0]
    CB, cwt = _tiles(c, ncw)  # VMEM: ~2 [CB, cwt] f32/i32 arrays

    relf = rel.astype(jnp.float32)
    bitsf = bits.astype(jnp.float32)
    q = relf * (1.0 - 2.0 * bitsf)                          # [C, n] exact
    h = bitsf[:, data_lo:]                                  # [C, d]
    hs = jnp.sum(h, axis=-1, keepdims=True)
    qh = jnp.concatenate(
        [q, h, hs, jnp.ones((c, 1), jnp.float32)], axis=1)
    QH = jnp.pad(qh, ((0, 0), (0, kp - (n + d + 2)))).astype(jnp.bfloat16)

    row_spec = pl.BlockSpec((CB, kp), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((kp, cwt), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((CB, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    kmin = pl.pallas_call(
        functools.partial(_kernel, shift_diff=shift_diff, cwt=cwt),
        interpret=interpret,
        grid=(c // CB, ncw // cwt),
        in_specs=[row_spec, tbl_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c, 1), jnp.int32),
    )(QH, jnp.asarray(tc_np))[:, 0]

    # out-of-kernel terms (module docstring): the row-constant base and
    # the single matches-hard column idx_hard
    reli = rel.astype(jnp.int32)
    bitsi = bits.astype(jnp.int32)
    base = jnp.sum(reli * bitsi, axis=-1) * np.int32(scale)   # [C]
    idxh = idx_hard.astype(jnp.int32)
    cw_hard = jnp.zeros_like(idxh)
    for jb in range(len(basis)):
        cw_hard = cw_hard ^ jnp.where(
            (idxh >> jb) & 1 != 0, jnp.int32(int(basis[jb])), 0)
    bitsw = jnp.sum(bitsi << jnp.arange(n, dtype=jnp.int32)[None, :],
                    axis=-1)
    mism = bitsw ^ cw_hard
    score_hard = jnp.sum(
        reli * ((mism[:, None] >> jnp.arange(n, dtype=jnp.int32)[None, :])
                & 1), axis=-1)
    md = mism >> data_lo  # diffs field of the hard candidate (SWAR popcount)
    md = md - ((md >> 1) & 0x55555555)
    md = (md & 0x33333333) + ((md >> 2) & 0x33333333)
    md = (md + (md >> 4)) & 0x0F0F0F0F
    diffs_hard = (md + (md >> 8) + (md >> 16) + (md >> 24)) & 0x3F
    p_hard = ((score_hard * np.int32(scale) + diffs_hard - base)
              * np.int32(1 << shift_diff) + idxh)
    return (jnp.minimum(kmin + np.int32(1 << shift_match), p_hard)
            + (base << shift_diff))


def golay2312_soft_keys(bits, rel, idx_hard, codewords, interpret=False):
    """Winning keys for soft Golay(23,12). bits/rel [C, 23]; idx_hard [C]
    is the hard-decode data word (== its codeword index)."""
    _CW_REGISTRY["golay"] = codewords
    return _soft_decode_pallas(bits, rel, idx_hard, "golay", 11, 23,
                               17, 16, 12, interpret)


def hamming1511_soft_keys(bits, rel, idx_hard, codewords, variant7100,
                          interpret=False):
    """Winning keys for soft Hamming(15,11). bits/rel [C, 15]; idx_hard [C]
    is the hard-decode data word (== its codeword index)."""
    key = "ham7100" if variant7100 else "hamstd"
    _CW_REGISTRY[key] = codewords
    return _soft_decode_pallas(bits, rel, idx_hard, key, 0, 15,
                               16, 15, 11, interpret)
