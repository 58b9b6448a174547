"""Batched Golay(23,12) / Hamming(15,11) ECC kernels.

TPU-native reformulation of the reference's scalar decoders
(/root/reference/src/ecc/ecc.c):

- Hard decodes become syndrome computation via small mod-2 matmuls plus a
  LUT gather — pure int32 lane math, bit-exact vs the reference.
- Soft decodes become a reliability-weighted score over the full codebook
  (batch x 4096 x 23 for Golay), i.e. one f32 matmul on the MXU, with the
  reference's three-level tie-break (score, matches-hard, fewer-diffs,
  first-index — ecc.c:54-67) encoded into a single lexicographic int32 key
  so the argmin stays vectorized.

All functions take/return bit arrays with LSB at index 0 (matching the
reference's in-memory convention) and operate over arbitrary leading batch
dimensions.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import T
from . import bits as bit_ops


def _use_pallas_soft(x) -> bool:
    """Fused Pallas soft decoder (ops/pallas/softecc.py)?
    MBE_TPU_PALLAS_SOFT: 1=always, 0=never, auto=TPU only (default). The
    kernel keeps the [C, ncw] score/diff products VMEM-resident (the XLA
    path round-trips them through HBM) and is bit-exact; leading batch dims
    are flattened into the 128-channel kernel blocks."""
    mode = os.environ.get("MBE_TPU_PALLAS_SOFT", "auto")
    lead = 1
    for s in x.shape[:-1]:
        lead *= s
    shape_ok = lead % 128 == 0
    if mode == "1":
        return shape_ok
    if mode == "auto":
        return shape_ok and jax.default_backend() == "tpu"
    return False

_POW2_23 = np.array([1 << i for i in range(23)], dtype=np.int32)
_POW2_15 = np.array([1 << i for i in range(15)], dtype=np.int32)
_POW2_12 = np.array([1 << i for i in range(12)], dtype=np.int32)
_POW2_11 = np.array([1 << i for i in range(11)], dtype=np.int32)


def _parity(x):
    """Bitwise parity of each int32 lane (values < 2^23) via xor-folds —
    lane-dense, no matmul/gather."""
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & 1


def _popcount12(x):
    """Population count of 12-bit int32 lanes."""
    x = x - ((x >> 1) & 0x555)
    x = (x & 0x333) + ((x >> 2) & 0x333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def popcount32(x):
    """Population count of non-negative int32 lanes (SWAR)."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x + (x >> 8) + (x >> 16) + (x >> 24)) & 0x3F


def _golay_gp_masks():
    """gp_masks[p] = data-word mask whose parity gives expected parity bit
    p: sum_i [golayGenerator[i] has bit p] << (11-i)."""
    gg = np.asarray(T.golayGenerator, np.int64)
    gp = np.zeros(11, np.int64)
    for p in range(11):
        for i in range(12):
            if (gg[i] >> p) & 1:
                gp[p] |= 1 << (11 - i)
    return gp


def _golay_g24():
    """Extended-Golay [I_12 | A] rest-part rows + column masks, built from
    this code's generator basis.

    Row j of A is the 12-bit (parity[11] | extparity[1]) part of the
    extended codeword for data bit j; G24 is self-dual, so A @ A.T == I
    over GF(2) (asserted at build). Amask[p] packs column p of A over j.
    """
    gp = _golay_gp_masks()
    A = np.zeros(12, np.int64)
    for j in range(12):
        c = 0
        for p in range(11):
            c |= ((gp[p] >> j) & 1) << p
        b = (1 + bin(c).count("1")) & 1  # extend to even weight
        A[j] = c | (b << 11)
    for i in range(12):
        for j in range(12):
            assert (bin(A[i] & A[j]).count("1") & 1) == (i == j)
    Amask = np.zeros(12, np.int64)
    for p in range(12):
        for j in range(12):
            Amask[p] |= ((A[j] >> p) & 1) << j
    return gp, A, Amask


_GOLAY_GP, _GOLAY_A, _GOLAY_AMASK = _golay_g24()


def golay_mask_from_syndrome(s11):
    """Coset-leader data-bit correction mask for an 11-bit Golay syndrome —
    the algebraic equivalent of the reference's 2048-entry golayMatrix
    (ecc_const.c), verified identical on all 2048 syndromes
    (test_ecc.py::test_golay_syndrome_mask_matches_reference_table).

    Golay(23,12) is perfect: every syndrome has a unique weight<=3 coset
    leader, recovered with the standard extended-G24 IMLD (two-sided
    syndrome decode) on the word (data=0, parity=s11, extbit chosen to
    make the 24-bit weight odd, so the error weight is odd <=3 and the
    wt-4 ambiguity of G24 never arises). ~300 lane-dense int ops replace
    the [C, 2048] compare-reduce the LUT needed (bits.lut1d at this table
    size cost ~0.2 ms/step at C=32768 — the bulk of the golay_hard
    ablation).
    """
    s11 = s11.astype(jnp.int32)
    rb = _parity(s11) ^ 1
    s = s11 | (rb << 11)
    e = jnp.zeros_like(s11)
    done = _popcount12(s) <= 3                      # e_data = 0
    for j in range(12):                             # single data-bit error
        hit = _popcount12(s ^ jnp.int32(int(_GOLAY_A[j]))) <= 2
        e = jnp.where(hit & ~done, jnp.int32(1 << j), e)
        done = done | hit
    t = jnp.zeros_like(s11)                         # t = A @ s
    for j in range(12):
        t = t | (_parity(s & jnp.int32(int(_GOLAY_A[j]))) << j)
    hit = _popcount12(t) <= 3                       # parity bits clean
    e = jnp.where(hit & ~done, t, e)
    done = done | hit
    for k in range(12):                             # single parity-bit error
        cand = t ^ jnp.int32(int(_GOLAY_AMASK[k]))
        hit = _popcount12(cand) <= 2
        e = jnp.where(hit & ~done, cand, e)
        done = done | hit
    return e


def golay2312_hard_packed(word):
    """Packed-word Golay(23,12) hard decode.

    Args: word [...] int32 — codeword in the low 23 bits, LSB-first layout
    (parity 0..10, data 11..22).
    Returns: (out_word [...] with corrected data / untouched parity bits,
    errs [...]) — errs counts corrected data-bit errors (ecc.c:259-301).

    The 11 syndrome parities run as xor-folds over generator masks — ~30
    lane-dense int ops, no bit-plane arrays at all; the syndrome -> mask
    step is the algebraic IMLD (golay_mask_from_syndrome) instead of the
    reference's 2048-entry LUT.
    """
    word = word.astype(jnp.int32)
    data = word >> 11
    ecc_in = word & 0x7FF

    # per-mask unrolled syndrome (measured faster than a [..., 11] trailer
    # axis); ecc_expected: row i of golayGenerator selected by codeword bit
    # 22-i == data bit 11-i, as parity over per-parity-bit data masks.
    syndrome = jnp.zeros_like(data)
    for p in range(11):
        syn_p = (_parity(data & jnp.int32(int(_GOLAY_GP[p])))
                 ^ ((ecc_in >> p) & 1))
        syndrome = syndrome | (syn_p << p)
    mask = golay_mask_from_syndrome(syndrome)
    corrected = data ^ mask
    errs = _popcount12(data ^ corrected)
    return (corrected << 11) | ecc_in, errs


def golay2312_hard(bits):
    """Decode Golay(23,12) codewords.

    Args:
      bits: [..., 23] int32 in {0,1}, LSB-first (parity 0..10, data 11..22).
    Returns:
      (out_bits [..., 23], errs [...]) — parity bits pass through uncorrected
      and errs counts corrected data-bit errors (ecc.c:259-301).
    """
    bits = bits.astype(jnp.int32)
    word = jnp.sum(bits * jnp.asarray(_POW2_23), axis=-1)
    out_word, errs = golay2312_hard_packed(word)
    out_data = (out_word[..., None] >> jnp.arange(11, 23, dtype=jnp.int32)) & 1
    out = jnp.concatenate([bits[..., :11], out_data], axis=-1)
    return out, errs


def check_golay_block(block):
    """Packed-int variant of mbe_checkGolayBlock (ecc.c:221-251).

    Args: block [...] int32, 23-bit codeword in the LSBs.
    Returns: 12-bit corrected data word [...] int32.
    """
    block = block.astype(jnp.int32)
    bits = (block[..., None] >> jnp.arange(23, dtype=jnp.int32)) & 1
    out, _ = golay2312_hard(bits)
    return jnp.sum(out[..., 11:] * jnp.asarray(_POW2_12), axis=-1)


def _soft_decode(bits, rel, codewords, data_lo, n):
    """Common exhaustive soft ML decode with the reference tie-break.

    bits/rel: [..., n] int32; codewords: [ncw, n] numpy; data_lo: first bit
    index counted for diffs/matches (11 for Golay data-only, 0 for Hamming).
    Returns (best_codeword_bits [..., n], best_diffs [...]).
    """
    bits = bits.astype(jnp.int32)
    rel = rel.astype(jnp.int32)
    # bf16 operands are EXACT here: every factor is an integer <= 255 (8
    # significand bits hold integers <= 256) and accumulation is forced to
    # f32 (sums < 2^24) — one MXU pass instead of the 6-pass f32-HIGHEST
    # decomposition, on the soft path's dominant matmuls.
    cw = jnp.asarray(codewords.astype(np.float32)).astype(jnp.bfloat16)
    ncw = codewords.shape[0]

    # score_c = sum_i rel_i * (bit_i != cw_ci)
    #         = sum_i rel_i*bit_i + sum_i rel_i*(1-2*bit_i)*cw_ci
    base = jnp.sum(rel * bits, axis=-1)  # [...]
    q = (rel * (1 - 2 * bits)).astype(jnp.bfloat16)  # [..., n]
    score = base[..., None] + jnp.matmul(
        q, cw.T, preferred_element_type=jnp.float32).astype(jnp.int32)

    # diffs_c over bits [data_lo, n): hamming distance of hard bits vs cw.
    h = bits[..., data_lo:].astype(jnp.bfloat16)
    cwd = cw[:, data_lo:]
    # dist = sum h + sum cw - 2 h.cw
    dist = (jnp.sum(h.astype(jnp.float32), axis=-1)[..., None]
            + jnp.sum(cwd.astype(jnp.float32), axis=-1)
            - 2.0 * jnp.matmul(h, cwd.T,
                               preferred_element_type=jnp.float32))
    diffs = dist.astype(jnp.int32)  # [..., ncw]
    return score, diffs, ncw


def golay2312_soft(bits, rel):
    """Soft Golay(23,12) (ecc.c:303-357).

    bits/rel: [..., 23] int32 (hard decisions + reliabilities 0..255).
    Returns (out_bits [..., 23], data_diffs [...]).
    Output keeps the *input hard* parity bits (ecc.c:353-355).
    """
    hard_out, _ = golay2312_hard(bits)
    if _use_pallas_soft(bits):
        from .pallas import softecc
        lead = bits.shape[:-1]
        # codeword index == packed data word (systematic codebook,
        # tables.py), so the matches-hard flag is an index compare
        idx_hard = jnp.sum(hard_out[..., 11:] * jnp.asarray(_POW2_12),
                           axis=-1)
        key = softecc.golay2312_soft_keys(
            bits.astype(jnp.int32).reshape(-1, 23),
            rel.astype(jnp.int32).reshape(-1, 23),
            idx_hard.reshape(-1), T.golay_codewords).reshape(lead)
        best = key & 0xFFF
        best_diffs = (key >> 12) & 0xF
        # codeword row gather -> packed-word lut1d + bit unpack (the data
        # word IS the candidate index for the systematic Golay codebook)
        data_out = (best[..., None]
                    >> jnp.arange(12, dtype=jnp.int32)) & 1
        out = jnp.concatenate(
            [bits.astype(jnp.int32)[..., :11], data_out], axis=-1)
        return out, best_diffs

    score, diffs, ncw = _soft_decode(bits, rel, T.golay_codewords, 11, 23)

    # matches_hard: candidate data == hard-decode(hard bits) data.
    hard_packed = jnp.sum(hard_out[..., 11:] * jnp.asarray(_POW2_12), axis=-1)
    cand_packed = jnp.asarray(T.golay_data_packed)  # [4096]
    matches = (cand_packed[None, :] == hard_packed[..., None]).astype(jnp.int32)

    idx = jnp.arange(ncw, dtype=jnp.int32)
    key = (score << 17) | ((1 - matches) << 16) | (diffs << 12) | idx
    best = jnp.argmin(key, axis=-1)  # first index wins ties

    # the codebook is systematic in candidate order (data word == index,
    # tables.py), so the output data bits are just the bits of `best`;
    # best_diffs via a fused compare-reduce instead of take_along_axis
    data_out = (best[..., None] >> jnp.arange(12, dtype=jnp.int32)) & 1
    out = jnp.concatenate([bits[..., :11], data_out], axis=-1)
    best_diffs = jnp.sum(
        jnp.where(idx == best[..., None], diffs, 0), axis=-1)
    return out, best_diffs


def hamming1511_hard_packed(block, variant7100=False):
    """Packed-word Hamming(15,11) hard decode (ecc.c:366-464).

    Args: block [...] int32, codeword in the low 15 bits.
    Returns: (corrected block, errs) — 0/1 errors corrected."""
    block = block.astype(jnp.int32)
    gen = np.asarray(
        T.imbe7100x4400hammingGenerator if variant7100
        else T.hammingGenerator, np.int32)
    syndrome = jnp.zeros_like(block)
    for p in range(4):  # per-mask unroll + lut1d: see golay2312_hard_packed
        syndrome = syndrome | (_parity(block & jnp.int32(int(gen[p]))) << p)
    lut = np.asarray(T.ham1511_7100_lut if variant7100 else T.ham1511_lut,
                     np.int32)
    corrected = block ^ bit_ops.lut1d(syndrome, lut)
    errs = (syndrome > 0).astype(jnp.int32)
    return corrected, errs


def hamming1511_hard(bits, variant7100=False):
    """Hamming(15,11) hard decode over bit-plane input (see the packed
    variant for the lane-dense core)."""
    bits = bits.astype(jnp.int32)
    block = jnp.sum(bits * jnp.asarray(_POW2_15), axis=-1)
    corrected, errs = hamming1511_hard_packed(block, variant7100)
    out = (corrected[..., None] >> jnp.arange(15, dtype=jnp.int32)) & 1
    return out, errs


# Hamming(15,11) data-bit positions (LSB-first codeword index i has data
# bit i at pos[i]; tools/gen_tables.py:159-168, from ecc.c:138-155)
_HAM_DATA_POS_STD = [2, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14]
_HAM_DATA_POS_7100 = [4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]


def hamming1511_soft(bits, rel, variant7100=False):
    """Soft Hamming(15,11) (ecc.c:157-215). Diffs counted over all 15 bits."""
    cb = T.hamming_codewords_7100 if variant7100 else T.hamming_codewords_std
    hard_out, _ = hamming1511_hard(bits, variant7100)
    if _use_pallas_soft(bits):
        from .pallas import softecc
        lead = bits.shape[:-1]
        # codeword index == data word at data_pos (tools/gen_tables.py
        # hamming_codebook), so matches-hard is an index compare; w picks
        # the data positions with their index weights
        pos = (_HAM_DATA_POS_7100 if variant7100 else _HAM_DATA_POS_STD)
        w = np.zeros(15, np.int32)
        w[pos] = 1 << np.arange(11)
        idx_hard = jnp.sum(hard_out * jnp.asarray(w), axis=-1)
        key = softecc.hamming1511_soft_keys(
            bits.astype(jnp.int32).reshape(-1, 15),
            rel.astype(jnp.int32).reshape(-1, 15),
            idx_hard.reshape(-1), cb, variant7100).reshape(lead)
        best = key & 0x7FF
        best_diffs = (key >> 11) & 0xF
        pk = np.asarray(T.hamming_7100_packed if variant7100
                        else T.hamming_std_packed, np.int32)
        word = bit_ops.lut1d(best, pk)  # packed lookup, then bit unpack
        out = (word[..., None] >> jnp.arange(15, dtype=jnp.int32)) & 1
        return out, best_diffs

    score, diffs, ncw = _soft_decode(bits, rel, cb, 0, 15)

    hard_packed = jnp.sum(hard_out * jnp.asarray(_POW2_15), axis=-1)
    packed = jnp.asarray(T.hamming_7100_packed if variant7100 else T.hamming_std_packed)
    matches = (packed[None, :] == hard_packed[..., None]).astype(jnp.int32)

    idx = jnp.arange(ncw, dtype=jnp.int32)
    key = (score << 16) | ((1 - matches) << 15) | (diffs << 11) | idx
    best = jnp.argmin(key, axis=-1)
    pk = np.asarray(T.hamming_7100_packed if variant7100
                    else T.hamming_std_packed, np.int32)
    word = bit_ops.lut1d(best, pk)  # packed lookup, then bit unpack
    out = (word[..., None] >> jnp.arange(15, dtype=jnp.int32)) & 1
    best_diffs = jnp.sum(
        jnp.where(idx == best[..., None], diffs, 0), axis=-1)
    return out, best_diffs
