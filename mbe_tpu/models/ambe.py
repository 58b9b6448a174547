"""AMBE 3600x2450 (DMR/NXDN) and 3600x2400 (D-STAR) codecs (batched).

Covers the common C0/demod/49-bit packing stage (ambe_common.c), both
parameter decoders, and both process FSMs (ambe3600x2450.c,
ambe3600x2400.c). Frame-type branching (voice/tone/erasure/silence/repeat/
mute) is computed for all lanes and committed with masks; the comfort-noise
RNG advances exactly once per frame on lanes that emitted comfort noise.
"""

import dataclasses
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bits as bit_ops
from ..ops import demod, ecc, noise
from ..ops.enhance import spectral_amp_enhance
from ..tables import T
from . import spectral
from .speech import current_frame_rm0, synthesize_speech_core
from .state import (MUTING_THRESHOLD_AMBE, Parms, ambe_default_parms_like,
                    erasure_parms, select, select_cases)
from ..ops import synth as synth_ops

_RCONST = np.float32(1.0 / (2.0 * np.sqrt(2.0)))


# ---------------------------------------------------------------------------
# Common frame stage: C0 ECC + demod + 49-bit packing (ambe_common.c:22-189)
# ---------------------------------------------------------------------------

def _extract_bits(word, hi, lo):
    """[hi-lo+1, C] bits of a packed word [C], MSB (bit `hi`) first
    (channel-minor: bit index on the leading axis)."""
    shifts = jnp.arange(hi, lo - 1, -1, dtype=jnp.int32)[:, None]
    return (word[None, :] >> shifts) & 1


_POW2_24 = np.array([1 << i for i in range(24)], np.int32)


def golay24_parity_fix(bit0, data_ones, errs):
    """Golay24 even-parity fix of fr[0][0] (ambe_common.c:22-60): a clean
    23-bit Golay decode with odd overall parity flips bit0 and counts one
    error. Single source of the rule for the packed hard path, the
    bit-plane soft path, and the staged API (api._ambe_c0)."""
    ones = bit0 + data_ones
    fix = (errs == 0) & ((ones & 1) != 0)
    return jnp.where(fix, bit0 ^ 1, bit0), jnp.where(fix, 1, errs)


def decode_ambe3600_frame(frame, soft_rel=None):
    """Batched mbe_decodeAmbe3600x24xxFrame common stage.

    Args: frame [C, 4, 24] int32 (+ soft_rel for the soft path).
    Returns: (ambe_d [49, C] channel-minor, c0_errors [C],
    protected_errors [C]). Hard path is packed-word channel-minor
    end-to-end (see imbe.decode_imbe7200_frame).
    """
    f = frame.astype(jnp.int32)
    if soft_rel is not None:
        return _decode_ambe3600_frame_soft(f, soft_rel)

    w = jnp.sum(f * jnp.asarray(_POW2_24), axis=-1).T  # [4, C] packed rows

    # C0: Golay over fr[0][1..23]; Golay24 even-parity fix of fr[0][0]
    g_out, c0_errs = ecc.golay2312_hard_packed((w[0] >> 1) & 0x7FFFFF)
    bit0, c0_errs = golay24_parity_fix(w[0] & 1, ecc.popcount32(g_out),
                                       c0_errs)
    fr0 = (g_out << 1) | bit0  # [C] 24-bit packed

    # demod C1 with keystream from C0 bits 23..12 (ambe_common.c:75-100)
    seed = 16 * ((fr0 >> 12) & 0xFFF)
    kw = demod.prng_keywords(seed, (23,))[0]
    fr1 = (w[1] & 0x7FFFFF) ^ kw

    # data ECC + 49-bit packing (ambe_common.c:127-157)
    g1_out, perrs = ecc.golay2312_hard_packed(fr1)

    ambe_d = jnp.concatenate([
        _extract_bits(fr0, 23, 12),      # C0 bits 23..12 (12)
        _extract_bits(g1_out, 22, 11),   # C1 data bits 22..11 (12)
        _extract_bits(w[2], 10, 0),      # C2 bits 10..0 (11)
        _extract_bits(w[3], 13, 0),      # C3 bits 13..0 (14)
    ], axis=0)                           # [49, C]
    return ambe_d, c0_errs, perrs


def _decode_ambe3600_frame_soft(f, soft_rel):
    # C0: Golay over fr[0][1..23]; Golay24 even-parity fix of fr[0][0]
    g_out, c0_errs = ecc.golay2312_soft(f[:, 0, 1:24], soft_rel[:, 0, 1:24])
    bit0, c0_errs = golay24_parity_fix(f[:, 0, 0], jnp.sum(g_out, axis=-1),
                                       c0_errs)
    fr0 = jnp.concatenate([bit0[:, None], g_out], axis=-1)  # [C, 24]

    # demod C1 with keystream from C0 bits 23..12 (ambe_common.c:75-100)
    seed = 16 * bit_ops.pack_descending(fr0, 23, 12)
    pr = demod.prng_bits(seed, 23).T  # [C, 23] (soft path is major)
    fr1 = f[:, 1, :23] ^ pr[:, ::-1]  # applied j=22..0

    # data ECC + 49-bit packing (ambe_common.c:127-157)
    g1_out, perrs = ecc.golay2312_soft(fr1, soft_rel[:, 1, :23])

    # soft path stays bit-plane channel-major; one transpose at the exit
    ambe_d = jnp.concatenate([
        fr0[:, 23:11:-1],        # C0 bits 23..12 (12)
        g1_out[:, 22:10:-1],     # C1 data bits 22..11 (12)
        f[:, 2, 10::-1],         # C2 bits 10..0 (11)
        f[:, 3, 13::-1],         # C3 bits 13..0 (14)
    ], axis=-1).T                # [49, C]
    return ambe_d, c0_errs, perrs


# ---------------------------------------------------------------------------
# Shared PRBA/HOC -> Tl machinery
# ---------------------------------------------------------------------------

@lru_cache(maxsize=2)
def _tl_factored(plus: bool):
    """Factored per-block IDCT (ambe3600x2450.c:365-387 /
    ambe3600x2400.c:403-425, with the k>6 zero rule folded in).

    Replaces the dense [57,57,24] Tl matrix whose one-hot-selected
    [C,57,24] product tensor was 179 MB of HBM per 32k-channel step: all
    17 possible block sizes are evaluated at once with one tiny
    [C*4,6]@[6,153] matmul (the idct table does not depend on the block
    index), then the actual size AmbeLmprbl[L,i] and the slot->band map
    are applied as fused selects. Same products, same accumulation order
    (the dropped terms are exact zeros) -> bitwise identical Tl.

      Midct[k-1, off(ji)+(j-1)] = ak * idct[ji][j][k]   (k <= min(ji,6))
      off(ji) = ji*(ji-1)/2  (compact column layout, ji = 1..17)
      jsel[L, i] = AmbeLmprbl[L, i];  scl[L, l] = i(l)*17 + (j(l)-1)
    """
    lmprbl = np.asarray(T.AmbePlusLmprbl if plus else T.AmbeLmprbl)  # [57,4]
    idct = np.asarray(T.ambe_idct_cos)  # [18,18,18]
    off = np.zeros(18, np.int32)
    for ji in range(1, 18):
        off[ji] = off[ji - 1] + (ji - 1)
    ncol = int(off[17] + 17)  # 153
    M = np.zeros((6, ncol), np.float32)
    for ji in range(1, 18):
        for j in range(1, ji + 1):
            for k in range(1, min(ji, 6) + 1):
                ak = 1.0 if k == 1 else 2.0
                M[k - 1, off[ji] + (j - 1)] = ak * idct[ji, j, k]
    scl = np.full((57, 57), -1.0, np.float32)
    for L in range(57):
        l = 1
        for i in range(4):
            for j in range(1, lmprbl[L, i] + 1):
                scl[L, l] = i * 17 + (j - 1)
                l += 1
    # Sparse incidence (round 3, same trick as models/imbe.py): band l can
    # only ever read the slots {scl[L, l] : L} — 622 (band, slot) pairs vs
    # the dense 68x57 chain's 3876. Dead pairs were exact-zero selects, so
    # skipping them is bitwise free.
    band_slots = [sorted({int(s) for s in scl[:, l] if s >= 0})
                  for l in range(57)]
    return M, off, lmprbl.astype(np.float32), scl, band_slots


@lru_cache(maxsize=2)
def _vuv_band_js(plus: bool):
    """Per-band candidate V/UV indices: jl(l) = trunc(l * 16 * f0) clipped
    to [0,7] can only take the values its codec's f0 table produces (245
    of the dense 8x57 pairs). Computed in f32 exactly as the runtime does."""
    if plus:  # 2400: f0 straight from the b0 table (clip domain 0..125)
        f0s = np.asarray(T.ambe2400_f0_by_b0, np.float32)
    else:     # 2450: voice table plus the silence f0 override
        f0s = np.concatenate([
            np.asarray(T.AmbeW0table, np.float32),
            np.asarray([T.ambe2450_silence_f0_w0[0]], np.float32)])
    out = []
    for l in range(57):
        jl = np.clip((np.float32(l) * np.float32(16.0) * f0s)
                     .astype(np.int32), 0, 7)
        out.append(sorted(set(jl.tolist())))
    return out


def _vuv_select(vrow, jl, plus: bool):
    """v_tab[l, c] = vrow[jl[l, c], c] via full-width dense selects.
    vrow [8, C] f32, jl [57, C] i32 -> [57, C] i32.

    jl is clipped to 0..7, so each lane matches exactly one t: 8 selects
    over the whole [57, C] block. The round-3 sparse per-band chain (245
    pairs) ran on [1, C] rows at 1/8 sublane occupancy — strictly more
    vreg work despite fewer element-ops (round-4 xprof finding); this is
    bitwise identical (the dense form covers every candidate t and more).

    MBE_TPU_BAND_SELECT=pairs re-enables the sparse chain for A/Bs. Like
    every MBE_TPU_* flag it binds at TRACE time (set it before the first
    jit call of the process — see CLAUDE.md / docs/PERFORMANCE.md)."""
    c = vrow.shape[-1]
    if os.environ.get("MBE_TPU_BAND_SELECT", "dense") == "pairs":
        cands = _vuv_band_js(plus)
        rows = []
        for l in range(57):
            row = jnp.zeros((1, c), jnp.float32)
            for t in cands[l]:
                row = jnp.where(jl[l:l + 1, :] == t, vrow[t:t + 1, :], row)
            rows.append(row)
        return jnp.concatenate(rows, axis=0).astype(jnp.int32)
    out = jnp.zeros((57, c), jnp.float32)
    for t in range(8):
        out = jnp.where(jl == t, vrow[t:t + 1, :], out)
    return out.astype(jnp.int32)


@lru_cache(maxsize=2)
def _ri_matrix():
    """Ri[i] = sum_m am * Gm[m] * ri_cos[m][i], m,i in 1..8 -> [8, 8]."""
    ri_cos = np.asarray(T.ambe_ri_cos)
    M = np.zeros((8, 8), np.float32)
    for m in range(1, 9):
        for i in range(1, 9):
            am = 1.0 if m == 1 else 2.0
            M[m - 1, i - 1] = am * ri_cos[m, i]
    return M


def _onehot_rows(idx, table):
    """Gather-as-matmul: rows of `table` [G, ...] selected by idx [C].
    Channel-minor: returns [...row shape, C]."""
    table = np.asarray(table, np.float32)
    g = table.shape[0]
    onehot = (idx[None, :] == jnp.arange(g, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)  # [G, C]
    flat = jnp.matmul(jnp.asarray(table.reshape(g, -1)).T, onehot,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    return flat.reshape(table.shape[1:] + (idx.shape[0],))


def _tl_from_codes(L, Gm, b5, b6, b7, b8, plus: bool):
    """Ri IDCT + Cik assembly + per-block IDCT, batched.

    Gm: [8, C] (Gm[0] must be 0). Returns Tl [57, C]. All table lookups run
    as one-hot MXU matmuls (TPU gathers are slow).
    """
    hp = jax.lax.Precision.HIGHEST
    Ri = jnp.matmul(jnp.asarray(_ri_matrix()).T, Gm, precision=hp,
                    preferred_element_type=jnp.float32)  # [8, C]

    ra = Ri[0::2]  # Ri[1,3,5,7] -> [4,C]
    rb = Ri[1::2]  # Ri[2,4,6,8]
    c1 = jnp.float32(0.5) * (ra + rb)
    c2 = _RCONST * (ra - rb)

    if plus:
        hoc5 = _onehot_rows(b5, T.AmbePlusHOCb5)
        hoc6 = _onehot_rows(b6, T.AmbePlusHOCb6)
        hoc7 = _onehot_rows(b7, T.AmbePlusHOCb7)
        hoc8 = _onehot_rows(b8, T.AmbePlusHOCb8)
    else:
        hoc5 = _onehot_rows(b5, T.AmbeHOCb5)
        hoc6 = _onehot_rows(b6, T.AmbeHOCb6)
        hoc7 = _onehot_rows(b7, T.AmbeHOCb7)
        hoc8 = _onehot_rows(b8, T.AmbeHOCb8)
    hoc = jnp.stack([hoc5, hoc6, hoc7, hoc8], axis=0)  # [4, 4, C] (k=3..6)

    cik = jnp.concatenate([c1[:, None, :], c2[:, None, :], hoc],
                          axis=1)  # [4, 6, C]
    c = cik.shape[-1]
    M, off, jsel_tab, scl_tab, band_slots = _tl_factored(plus)
    Ls = jnp.clip(L, 0, 56)
    jsel = _onehot_rows(Ls, jsel_tab)  # [4, C] actual block sizes
    if os.environ.get("MBE_TPU_AMBE_TL", "gather") == "dense":
        # round-2 form: evaluate ALL 17 block sizes, then select. The
        # [4, 153, C] U tensor is 80 MB of HBM at C=32768 and the select
        # loop streams it again (xprof round 5: 0.42 ms/step combined).
        # U[i, m, c] = sum_k cik[i, k, c] * M[k, m]
        U = jnp.einsum("ikc,km->imc", cik, jnp.asarray(M), precision=hp,
                       preferred_element_type=jnp.float32)  # [4, 153, C]
        usel = jnp.zeros((4, 17, c), jnp.float32)
        for ji in range(1, 18):
            sl = jnp.pad(U[:, int(off[ji]):int(off[ji]) + ji, :],
                         ((0, 0), (0, 17 - ji), (0, 0)))
            usel = usel + jnp.where(jsel[:, None, :] == jnp.float32(ji),
                                    sl, 0.0)
    else:
        # round 5: gather each block's padded [6, 17] IDCT matrix by its
        # actual size (one-hot MXU matmul per block index — exact: one 1.0
        # per column), then accumulate ascending k exactly like the
        # reference's inner loop (ambe3600x2450.c:365-387). Only the
        # selected block's columns are ever computed, so the all-sizes U
        # tensor and its 17-pass select loop disappear. jsel == 0 (L == 0
        # lanes) gives an all-zero one-hot -> exact-zero rows, matching
        # the dense form's never-matching select.
        Mpad = np.zeros((17, 6, 17), np.float32)
        for v in range(1, 18):
            Mpad[v - 1, :, :v] = M[:, int(off[v]):int(off[v]) + v]
        MpadT = jnp.asarray(Mpad.reshape(17, 102).T)  # [102, 17]
        vvals = jnp.arange(1, 18, dtype=jnp.float32)[:, None]
        rows = []
        for i in range(4):
            oh = (jsel[i][None, :] == vvals).astype(jnp.float32)  # [17, C]
            Mi = jnp.matmul(MpadT, oh, precision=hp,
                            preferred_element_type=jnp.float32)
            Mi = Mi.reshape(6, 17, c)
            acc = cik[i, 0][None, :] * Mi[0]
            for k in range(1, 6):
                acc = acc + cik[i, k][None, :] * Mi[k]
            rows.append(acc)
        usel = jnp.stack(rows, axis=0)  # [4, 17, C]
    slots = usel.reshape(68, c)
    sclsel = _onehot_rows(Ls, scl_tab)  # [57, C]
    if os.environ.get("MBE_TPU_BAND_SELECT", "dense") == "pairs":
        # per-band sparse slot select (622 pairs vs the dense 68x57 = 3876;
        # exclusive selects, default 0 where scl == -1 — bitwise identical)
        rows = [jnp.zeros((1, c), jnp.float32)]  # band 0: scl always -1
        for l in range(1, 57):
            row = jnp.zeros((1, c), jnp.float32)
            for s in band_slots[l]:
                row = jnp.where(sclsel[l:l + 1, :] == jnp.float32(s),
                                slots[s:s + 1, :], row)
            rows.append(row)
        return jnp.concatenate(rows, axis=0)
    # 8-row block-union select: the 622-pair sparse chain runs on [1, C]
    # rows at 1/8 sublane occupancy (round-4 xprof finding). Grouping bands
    # into 8-row blocks and selecting over the UNION of the block's
    # candidate slots needs only 15+23+24+22+19+14+9+1 = 127 full-density
    # [8, C] selects. Selects are exclusive (each lane's scl value matches
    # at most one s; scl == -1 matches none and keeps the 0 default), so
    # the result is bitwise identical to the sparse chain.
    blocks = []
    for b in range(0, 57, 8):
        hi = min(b + 8, 57)
        union = sorted(set().union(*[set(band_slots[l])
                                     for l in range(b, hi)]))
        blk = jnp.zeros((hi - b, c), jnp.float32)
        for s in union:
            blk = jnp.where(sclsel[b:hi, :] == jnp.float32(s),
                            slots[s:s + 1, :], blk)
        blocks.append(blk)
    return jnp.concatenate(blocks, axis=0)


# ---------------------------------------------------------------------------
# AMBE+2 3600x2450 decode (ambe3600x2450.c:176-621)
# ---------------------------------------------------------------------------

def tone_verified_2450(ambe_d):
    """JMBE tone classification checks (ambe3600x2450.c:474-491).
    ambe_d: [49, C] channel-minor."""
    d = ambe_d.astype(jnp.int32)
    w12 = jnp.asarray(1 << np.arange(11, -1, -1, dtype=np.int64),
                      jnp.int32)[:, None]
    u0 = jnp.sum(d[0:12, :] * w12, axis=0)
    u1 = jnp.sum(d[12:24, :] * w12, axis=0)
    w14 = jnp.asarray(1 << np.arange(13, -1, -1, dtype=np.int64),
                      jnp.int32)[:, None]
    u3 = jnp.sum(d[35:49, :] * w14, axis=0)
    return ((u0 >> 6) & 0x3F) == 63, (u3 & 0xF) == 0, \
        ((u1 >> 8) & 0xF) == (u1 & 0xF)


def tone_id_2450(ambe_d):
    """ID1 = ambe_d bits 12..19 MSB-first (ambe3600x2450.c:80-89)."""
    d = ambe_d.astype(jnp.int32)
    wts = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.int32))[:, None]
    return jnp.sum(d[12:20, :] * wts, axis=0)


def decode_ambe2450_parms(ambe_d, cur: Parms, prev: Parms, total_errors):
    """Batched mbe_decodeAmbe2450ParmsInternal (ambe3600x2450.c:564-621).

    total_errors: [C] i32, or negatives to disable the tone BER gate.
    Returns (cur', prev', bad [C]: 0 voice/silence, 2 erasure, 7 tone).
    """
    d = ambe_d.astype(jnp.int32)

    t0, t3, t1 = tone_verified_2450(d)
    gate = (total_errors < 6) | (total_errors < 0)
    tone = t0 & (t3 | t1) & gate

    b0idx = jnp.asarray(np.array([0, 1, 2, 3, 37, 38, 39], np.int32))
    b0w = jnp.asarray((1 << np.arange(6, -1, -1)).astype(np.int32))[:, None]
    b0 = jnp.sum(d[b0idx, :] * b0w, axis=0)
    sil = ~tone & ((b0 == 124) | (b0 == 125))
    era = ~tone & ~sil & (b0 >= 120)
    voice = ~tone & ~sil & ~era
    bad = jnp.where(tone, 7, jnp.where(era, 2, 0))

    b0v = jnp.clip(b0, 0, 119)
    sil_f0 = jnp.float32(float(T.ambe2450_silence_f0_w0[0]))
    sil_w0 = jnp.float32(float(T.ambe2450_silence_f0_w0[1]))
    # b0-indexed tables via fused compare-reduce (bits.lut1d; dynamic
    # gathers cost ~0.25 ms per [C]-shaped take at C=32768)
    f0 = jnp.where(sil, sil_f0,
                   bit_ops.lut1d(b0v, np.asarray(T.AmbeW0table, np.float32)))
    w0 = jnp.where(sil, sil_w0,
                   bit_ops.lut1d(b0v, np.asarray(T.ambe2450_w0_by_b0,
                                                 np.float32)))
    L = jnp.where(sil, jnp.where(b0 == 124, 15, 14),
                  bit_ops.lut1d(b0v, np.asarray(T.AmbeLtable, np.int32)))

    unvc = jnp.float32(0.2046) / jnp.sqrt(w0)

    # V/UV (ambe3600x2450.c:197-219); silence zeroes Vl[1..L] instead
    b1 = ((d[4] << 4) | (d[5] << 3) | (d[6] << 2) | (d[7] << 1)
          | d[35])
    lf = jnp.arange(57, dtype=jnp.float32)[:, None]
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    jl = (lf * jnp.float32(16.0) * f0[None, :]).astype(jnp.int32)
    jl = jnp.clip(jl, 0, 7)
    vrow = _onehot_rows(b1, T.AmbeVuv)  # [8, C]
    v_tab = _vuv_select(vrow, jl, plus=False)
    in_band = (li >= 1) & (li <= L[None, :])
    Vl = jnp.where(in_band & sil[None, :], 0,
                   jnp.where(in_band & ~sil[None, :], v_tab, cur.Vl))

    # gain (ambe3600x2450.c:598-607)
    b2 = ((d[8] << 4) | (d[9] << 3) | (d[10] << 2) | (d[11] << 1)
          | d[36])
    gamma = (bit_ops.lut1d(b2, np.asarray(T.AmbeDg, np.float32))
             + jnp.float32(0.5) * prev.gamma)

    # PRBA (ambe3600x2450.c:221-273)
    b3 = ((d[12] << 8) | (d[13] << 7) | (d[14] << 6) | (d[15] << 5)
          | (d[16] << 4) | (d[17] << 3) | (d[18] << 2)
          | (d[19] << 1) | d[40])
    b4 = ((d[20] << 6) | (d[21] << 5) | (d[22] << 4) | (d[23] << 3)
          | (d[41] << 2) | (d[42] << 1) | d[43])
    gm24 = _onehot_rows(b3, T.AmbePRBA24)  # [3, C]
    gm58 = _onehot_rows(b4, T.AmbePRBA58)  # [4, C]
    Gm = jnp.concatenate(
        [jnp.zeros_like(gamma)[None, :], gm24, gm58], axis=0)  # [8, C]

    b5 = ((d[24] << 4) | (d[25] << 3) | (d[26] << 2) | (d[27] << 1)
          | d[44])
    b6 = (d[28] << 3) | (d[29] << 2) | (d[30] << 1) | d[45]
    b7 = (d[31] << 3) | (d[32] << 2) | (d[33] << 1) | d[46]
    b8 = (d[34] << 2) | (d[47] << 1) | d[48]
    Tl = _tl_from_codes(L, Gm, b5, b6, b7, b8, plus=False)

    Ml_n, log2_n, pM, pLg, cL = spectral.spectral_update(
        L, prev.L, prev.Ml, prev.log2Ml, Tl,
        weight=jnp.full_like(gamma, 0.65), gamma=gamma, unvc=unvc, Vl=Vl,
        cur_Ml=cur.Ml, cur_log2Ml=cur.log2Ml)

    ok = voice | sil
    okc = ok[None, :]
    cur_out = dataclasses.replace(
        cur,
        w0=jnp.where(ok, w0, cur.w0),
        L=jnp.where(ok, cL, cur.L),
        Vl=jnp.where(okc, Vl, cur.Vl),
        gamma=jnp.where(ok, gamma, cur.gamma),
        Ml=jnp.where(okc, Ml_n, cur.Ml),
        log2Ml=jnp.where(okc, log2_n, cur.log2Ml))
    prev_out = dataclasses.replace(
        prev,
        Ml=jnp.where(okc, pM, prev.Ml),
        log2Ml=jnp.where(okc, pLg, prev.log2Ml))
    return cur_out, prev_out, bad


# ---------------------------------------------------------------------------
# AMBE 3600x2400 decode (ambe3600x2400.c:164-546)
# ---------------------------------------------------------------------------

def decode_ambe2400_parms(ambe_d, cur: Parms, prev: Parms):
    """Batched mbe_decodeAmbe2400Parms.

    Returns (cur', prev', bad [C]): 0 voice, 3 tone/silence classify,
    5..122 D-STAR tone index.
    """
    d = ambe_d.astype(jnp.int32)

    b0idx = jnp.asarray(np.array([0, 1, 2, 3, 4, 5, 48], np.int32))
    b0w = jnp.asarray((1 << np.arange(6, -1, -1)).astype(np.int32))[:, None]
    b0 = jnp.sum(d[b0idx, :] * b0w, axis=0)
    tone_b0 = (b0 & 0x7E) == 0x7E
    tone_index = synth_ops.dstar_tone_id(d)
    single_tone = tone_b0 & (tone_index >= 5) & (tone_index <= 122)
    dual_range = tone_b0 & (tone_index >= 128) & (tone_index <= 163)
    silence = tone_b0 & ~single_tone & ~dual_range
    bad = jnp.where(single_tone, tone_index,
                    jnp.where(tone_b0, 3, 0))
    voice = ~tone_b0

    b0v = jnp.clip(b0, 0, 125)
    f0 = bit_ops.lut1d(b0v, np.asarray(T.ambe2400_f0_by_b0, np.float32))
    w0 = jnp.where(silence, jnp.float32(float(T.ambe2400_silence_w0[0])),
                   bit_ops.lut1d(b0v, np.asarray(T.ambe2400_w0_by_b0,
                                                 np.float32)))
    L = jnp.where(silence, 14,
                  bit_ops.lut1d(b0v, np.asarray(T.AmbePlusLtable, np.int32)))
    unvc = jnp.float32(0.2046) / jnp.sqrt(w0)

    # V/UV (ambe3600x2400.c:244-263); silence zeroes Vl[1..14]
    b1 = (d[38] << 3) | (d[39] << 2) | (d[40] << 1) | d[41]
    lf = jnp.arange(57, dtype=jnp.float32)[:, None]
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    jl = jnp.clip((lf * jnp.float32(16.0) * f0[None, :]).astype(jnp.int32),
                  0, 7)
    vrow = _onehot_rows(b1, T.AmbePlusVuv)  # [8, C]
    v_tab = _vuv_select(vrow, jl, plus=True)
    in_band = (li >= 1) & (li <= L[None, :])
    Vl = jnp.where(in_band & silence[None, :], 0,
                   jnp.where(in_band & voice[None, :], v_tab, cur.Vl))

    b2 = ((d[6] << 5) | (d[7] << 4) | (d[8] << 3) | (d[9] << 2)
          | (d[42] << 1) | d[43])
    gamma = (bit_ops.lut1d(b2, np.asarray(T.AmbePlusDg, np.float32))
             + jnp.float32(0.5) * prev.gamma)

    b3 = ((d[10] << 8) | (d[11] << 7) | (d[12] << 6) | (d[13] << 5)
          | (d[14] << 4) | (d[15] << 3) | (d[16] << 2)
          | (d[44] << 1) | d[45])
    b4 = ((d[17] << 6) | (d[18] << 5) | (d[19] << 4) | (d[20] << 3)
          | (d[21] << 2) | (d[46] << 1) | d[47])
    gm24 = _onehot_rows(b3, T.AmbePlusPRBA24)
    gm58 = _onehot_rows(b4, T.AmbePlusPRBA58)
    Gm = jnp.concatenate(
        [jnp.zeros_like(gamma)[None, :], gm24, gm58], axis=0)

    b5 = (d[22] << 3) | (d[23] << 2) | (d[25] << 1) | d[26]
    b6 = (d[27] << 3) | (d[28] << 2) | (d[29] << 1) | d[30]
    b7 = (d[31] << 3) | (d[32] << 2) | (d[33] << 1) | d[34]
    b8 = (d[35] << 3) | (d[36] << 2) | (d[37] << 1)
    Tl = _tl_from_codes(L, Gm, b5, b6, b7, b8, plus=True)

    Ml_n, log2_n, pM, pLg, cL = spectral.spectral_update(
        L, prev.L, prev.Ml, prev.log2Ml, Tl,
        weight=jnp.full_like(gamma, 0.65), gamma=gamma, unvc=unvc, Vl=Vl,
        cur_Ml=cur.Ml, cur_log2Ml=cur.log2Ml)

    # silence writes only w0/L/Vl (ambe3600x2400.c:202-210); voice writes all
    model = voice | silence
    cur_out = dataclasses.replace(
        cur,
        w0=jnp.where(model, w0, cur.w0),
        L=jnp.where(model, jnp.where(voice, cL, L), cur.L),
        Vl=jnp.where(model[None, :], Vl, cur.Vl),
        gamma=jnp.where(voice, gamma, cur.gamma),
        Ml=jnp.where(voice[None, :], Ml_n, cur.Ml),
        log2Ml=jnp.where(voice[None, :], log2_n, cur.log2Ml))
    prev_out = dataclasses.replace(
        prev,
        Ml=jnp.where(voice[None, :], pM, prev.Ml),
        log2Ml=jnp.where(voice[None, :], pLg, prev.log2Ml))
    return cur_out, prev_out, bad


# ---------------------------------------------------------------------------
# Process FSMs
# ---------------------------------------------------------------------------

def _ambe_prepare(total_errors, cur: Parms, prev: Parms, enh: Parms,
                  rate_coeff):
    """Common prepare: ensure AMBE defaults + error-rate IIR
    (ambe3600x2450.c:716-747 / ambe3600x2400.c:629-659)."""
    need_init = jnp.abs(prev.mutingThreshold - MUTING_THRESHOLD_AMBE) > 1e-6
    defaults = ambe_default_parms_like(cur)
    cur = select(need_init, defaults, cur)
    prev = select(need_init, defaults, prev)
    enh = select(need_init, defaults, enh)

    cur = dataclasses.replace(
        cur,
        mutingThreshold=jnp.full_like(cur.mutingThreshold,
                                      MUTING_THRESHOLD_AMBE),
        errorCountTotal=total_errors,
        errorCount4=jnp.zeros_like(cur.errorCount4),
        errorRate=(jnp.float32(0.95) * prev.errorRate
                   + rate_coeff * total_errors.astype(jnp.float32)))
    return cur, prev, enh


def _speech_paths(cur: Parms, prev: Parms, enh: Parms, voice_ok, tone_replay,
                  comfort_samples, lcg_prime):
    """Single shared speech-core invocation covering both the voice path
    (enhance cur, synth vs enh) and the invalid-tone replay path (synth enh
    vs enh; ambe3600x2450.c:801-820).

    Returns (audio, synth_cur_out, prev_raw, core_mute).
    prev_raw is the pre-enhancement cur (C: moveMbeParms(cur, prev) before
    enhancement, ambe3600x2450.c:789)."""
    prev_raw = cur
    Ml_e, rm0_v = spectral_amp_enhance(cur.w0, cur.L, cur.Ml)
    cur_enh = dataclasses.replace(cur, Ml=Ml_e)

    synth_cur = select(tone_replay, enh, cur_enh)
    rm0 = jnp.where(tone_replay, current_frame_rm0(enh),
                    jnp.where(voice_ok, rm0_v, 0.0))
    audio, synth_cur2, _enh_mut, aux = synthesize_speech_core(
        synth_cur, enh, comfort_samples, lcg_prime, rm0)
    return audio, synth_cur2, prev_raw, aux


def process_ambe2450(ambe_d, total_errors, c0_errors, c0_valid,
                     cur: Parms, prev: Parms, enh: Parms, comfort_rng,
                     lcg_prime, tones_enabled: bool = True):
    """Batched mbe_processAmbe2450Dataf (ambe3600x2450.c:851-877).

    Returns (audio [160, C], cur', prev', enh', comfort_rng', flags dict).
    """
    cur, prev, enh = _ambe_prepare(total_errors, cur, prev, enh,
                                   jnp.float32(0.001064))
    c0e = jnp.where(c0_valid, c0_errors, 0)

    cur, prev, bad = decode_ambe2450_parms(ambe_d, cur, prev, total_errors)

    # -- update_decode_state (ambe3600x2450.c:760-783) ----------------------
    is_era = bad == 2
    is_tone = bad == 7
    rep = ((bad == 0)
           & jnp.where(c0_valid, (c0e >= 4) | ((c0e >= 2) & (total_errors >= 6)),
                       total_errors > 3))
    cur_z = dataclasses.replace(cur, repeatCount=jnp.zeros_like(cur.repeatCount))
    cur_era = erasure_parms(cur_z, prev)
    cur_rep = dataclasses.replace(prev, repeatCount=prev.repeatCount + 1)
    cur = select_cases([(is_era, cur_era), (is_tone, cur_z),
                        (rep, cur_rep)], cur_z)

    # -- synthesize_frame (ambe3600x2450.c:831-849) --------------------------
    voice = bad == 0
    voice_ok = voice & (cur.repeatCount < 4)
    voice_mute = voice & ~voice_ok
    tone_valid = bit_ops.lut1d(tone_id_2450(ambe_d),
                               np.asarray(T.tone_valid, np.int32)) != 0
    tone_play = is_tone & tone_valid
    tone_replay = is_tone & ~tone_valid & (prev.repeatCount < 4)
    tone_cn = is_tone & ~tone_valid & ~tone_replay

    cn, new_rng = noise.comfort_noise(comfort_rng)
    audio_s, synth_out, prev_raw, aux = _speech_paths(
        cur, prev, enh, voice_ok, tone_replay, cn, lcg_prime)

    ad, id1 = synth_ops.parse_tone_fields(ambe_d)
    if tones_enabled:
        tone_audio, swn2, tp2 = synth_ops.render_tone(id1, ad, cur.swn,
                                                      cur.tonePhase)
    else:
        # DISABLE_AMBE_TONES: tone frames render silence, state untouched
        # (mbelib.c:747-751)
        tone_audio = jnp.zeros_like(cn)
        swn2, tp2 = cur.swn, cur.tonePhase

    cn_lanes = voice_mute | tone_cn | is_era
    do_speech = voice_ok | tone_replay
    audio = jnp.where(do_speech[None, :], audio_s,
                      jnp.where(tone_play[None, :], tone_audio,
                                jnp.where(cn_lanes[None, :], cn, 0.0)))

    rng_used = (do_speech & aux["mute"]) | cn_lanes
    comfort_rng = jnp.where(rng_used[None, :], new_rng, comfort_rng)
    lcg_prime = jnp.where(do_speech & aux["cold_consumed"],
                          jnp.float32(3147.0), lcg_prime)

    # -- state commits -------------------------------------------------------
    defaults = ambe_default_parms_like(cur)
    reinit = voice_mute | tone_cn

    cur_tone = dataclasses.replace(cur, swn=swn2, tonePhase=tp2)
    cur = select_cases([(voice_ok, synth_out), (tone_play, cur_tone),
                        (reinit, defaults)], cur)
    prev = select_cases([(voice_ok, prev_raw),
                         (is_era, cur),  # erasure: prev <- cur
                         (reinit, defaults)], prev)
    enh = select_cases([(voice_ok | tone_replay, synth_out),
                        (is_era, cur), (reinit, defaults)], enh)

    flags = dict(erasure=is_era, tone=is_tone, repeat=rep,
                 mute=voice_mute)
    return audio, cur, prev, enh, comfort_rng, lcg_prime, flags


def process_ambe2400(ambe_d, total_errors, c0_errors, c0_valid,
                     cur: Parms, prev: Parms, enh: Parms, comfort_rng,
                     lcg_prime, tones_enabled: bool = True):
    """Batched mbe_processAmbe2400Dataf (ambe3600x2400.c:732-762)."""
    cur, prev, enh = _ambe_prepare(total_errors, cur, prev, enh,
                                   jnp.float32(0.001064))
    c0e = jnp.where(c0_valid, c0_errors, 0)

    cur, prev, bad = decode_ambe2400_parms(ambe_d, cur, prev)

    # -- update_decode_state (ambe3600x2400.c:661-686) -----------------------
    is_tone3 = bad == 3
    dstar_tone = (bad >= 7) & (bad <= 122) & (c0e < 2) & (total_errors < 3)
    passthru = is_tone3 | dstar_tone
    rep = ~passthru & (total_errors > 3)
    cur_z = dataclasses.replace(cur, repeatCount=jnp.zeros_like(cur.repeatCount))
    cur_rep = dataclasses.replace(prev, repeatCount=prev.repeatCount + 1)
    cur = select_cases([(is_tone3, cur_z), (dstar_tone, cur),
                        (rep, cur_rep)], cur_z)

    # -- synthesize_frame (ambe3600x2400.c:711-730) ---------------------------
    voice = bad == 0
    voice_ok = voice & (cur.repeatCount < 4)
    voice_mute = voice & ~voice_ok

    cn, new_rng = noise.comfort_noise(comfort_rng)
    audio_s, synth_out, prev_raw, aux = _speech_paths(
        cur, prev, enh, voice_ok, jnp.zeros_like(voice_ok), cn, lcg_prime)

    # D-STAR tone: fixed amplitude 103, single tone by index (mbelib.c:813-856)
    if tones_enabled:
        tone_audio, swn2, tp2 = synth_ops.render_tone(
            jnp.clip(bad, 0, 255), jnp.full_like(bad, 103), cur.swn,
            cur.tonePhase)
    else:
        tone_audio = jnp.zeros_like(cn)
        swn2, tp2 = cur.swn, cur.tonePhase

    cn_lanes = voice_mute | (~voice & ~dstar_tone)  # bad==3, 5/6, noisy tones
    audio = jnp.where(voice_ok[None, :], audio_s,
                      jnp.where(dstar_tone[None, :], tone_audio,
                                jnp.where(cn_lanes[None, :], cn, 0.0)))

    rng_used = (voice_ok & aux["mute"]) | cn_lanes
    comfort_rng = jnp.where(rng_used[None, :], new_rng, comfort_rng)
    lcg_prime = jnp.where(voice_ok & aux["cold_consumed"],
                          jnp.float32(3147.0), lcg_prime)

    defaults = ambe_default_parms_like(cur)
    cur_tone = dataclasses.replace(cur, swn=swn2, tonePhase=tp2)
    cur = select_cases([(voice_ok, synth_out), (dstar_tone, cur_tone),
                        (cn_lanes, defaults)], cur)
    prev = select_cases([(voice_ok, prev_raw),
                         (dstar_tone, cur),  # prev <- cur after tone
                         (cn_lanes, defaults)], prev)
    enh = select_cases([(voice_ok, synth_out), (cn_lanes, defaults)], enh)

    flags = dict(erasure=jnp.zeros_like(voice), tone=is_tone3, repeat=rep,
                 mute=voice_mute)
    return audio, cur, prev, enh, comfort_rng, lcg_prime, flags
