"""IMBE 4400 parameter decode + frame FSM + process step (batched).

Covers mbe_decodeImbe4400Parms / mbe_processImbe4400Dataf and the 7200x4400
frame ECC/demod stage (imbe7200x4400.c), plus the 7100x4400 variant's ECC and
7100->7200 bit conversion (imbe7100x4400.c). The per-L bit-allocation
scatter (bo/ba/hoba/ImbeJi, 48 layouts) becomes dense gather tables indexed
by L9 lane-wise; all frame-type branching is mask-select.
"""

import dataclasses
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bits as bit_ops
from ..ops import demod, ecc, noise
from ..tables import T
from . import spectral
from .state import Parms, MUTING_THRESHOLD_IMBE
from .speech import synthesize_speech_core
from ..ops.enhance import spectral_amp_enhance
from .state import imbe_headroom_reset, select_cases

_B0_IDX = np.array([0, 1, 2, 3, 4, 5, 85, 86], np.int32)
_POW2_23 = np.array([1 << i for i in range(23)], np.int32)
_POW2_24 = np.array([1 << i for i in range(24)], np.int32)

# 7200-layout imbe_d fields (base, length): C0 data, 3x Golay data, 3x
# Hamming data, 7 raw bits (imbe7200x4400.c:469-515). The packed-word
# forms below store field bit t at packed position base+t ("field
# forward"), so the hard frame path assembles the 3 words directly from
# its packed ECC outputs.
_FIELDS_7200 = ((0, 12), (12, 12), (24, 12), (36, 12),
                (48, 11), (59, 11), (70, 11), (81, 7))
# 7100 (pre-convert) layout: C0 7 bits, 3x Golay, 2x Hamming, 23 raw
# (imbe7100x4400.c:313-378)
_FIELDS_7100 = ((0, 7), (7, 12), (19, 12), (31, 12),
                (43, 11), (54, 11), (65, 23))


@lru_cache(maxsize=1)
def _decode_tables():
    """Host-precomputed sparse layouts for the 48 distinct L values.

    TPU note: per-lane gathers/scatters are slow on TPU, but the bb[58][12]
    bit scatter (imbe7200x4400.c:156-168) has special structure: every input
    bit d[6+n] lands in exactly ONE decoded field, with a power-of-two
    weight, and the field/weight depend only on L (48 variants). So instead
    of a dense [48, 88, 116] weight tensor (whose [C, 48*128] product tensor
    round-trips HBM), we precompute per-bit column/weight tables
    (colT/wT [48, 88]), select them per lane with one tiny [C,48]@[48,88]
    matmul each, and scatter-add into 72 reduced output columns with a fused
    compare-reduce (no MXU, no big intermediate). Reduced column layout:
      0..11   bb[1][t] voicing source bits (expanded to Vl[l] arithmetically:
              Vl[l] = bb[1][max(K-1-(l-1)/3, 0)], imbe7200x4400.c:170-188)
      12      b2 gain index (weights 2^t)
      13..17  gain codes bm for i=2..6
      18..71  HOC codes bm for (i, k-2) in [6, 9]

    The per-L Tl IDCT (imbe7200x4400.c:251-270) is likewise factored into
    its 6 blocks: U[(c,i), (ji,j)] = Cik_block @ Midct (one [C*6,10]@[10,110]
    matmul over the 11 possible block sizes), a fused one-hot reduce over
    the per-block size jivar[c,i] = Ji[L9,i], and a fused slot->band scatter
    via scl[c,l] = i(l)*10 + j(l)-1. Bitwise identical to the dense form:
    the dropped terms are exact zeros and f32 `x+0 == x`.
    """
    Ji = np.asarray(T.ImbeJi)          # [48, 6]
    hoba = np.asarray(T.hoba)          # [48, 50]
    idct = np.asarray(T.imbe_idct_cos)  # [11,11,11] cosf table
    L_by_b0 = np.asarray(T.imbe_L_by_b0)
    bo = np.asarray(T.bo)              # [48, 79, 2]
    ba = np.asarray(T.ba)              # [48, 5, 2]

    # source d-index for each bb position: bb[row][t] <- d[6+n]
    src = np.full((48, 58, 12), -1, np.int32)
    for L9 in range(48):
        for n in range(79):
            src[L9, bo[L9, n, 0], bo[L9, n, 1]] = 6 + n

    # K for each L9 (imbe7200x4400.c:144-148)
    K_of = np.zeros(48, np.int32)
    for L9 in range(48):
        L = L9 + 9
        K_of[L9] = (L + 2) // 3 if L < 37 else 12

    NCOLS = 72  # 12 bb1 + 1 b2 + 5 gains + 54 HOC
    colT = np.full((48, 88), NCOLS, np.int32)  # NCOLS = dead (never matches)
    wT = np.zeros((48, 88), np.float32)
    m_valid = np.zeros((48, 6, 9), bool)
    hoc_qfac = np.zeros((48, 54), np.float32)   # quantstep*standdev (f32)
    hoc_off = np.zeros((48, 54), np.float32)    # exp2f(Bm-1)
    gain_bits = ba[:, :, 0].astype(np.int32)    # [48, 5]
    qs = np.asarray(T.quantstep)
    sd = np.asarray(T.standdev)
    for L9 in range(48):
        # voicing source bits: bb[1][t], t=0..11
        for t in range(12):
            s = src[L9, 1, t]
            if s >= 0:
                colT[L9, s] = t
                wT[L9, s] = 1.0
        # b2 = bits_descending(bb[2], 5, 0)
        for t in range(6):
            s = src[L9, 2, t]
            if s >= 0:
                colT[L9, s] = 12
                wT[L9, s] = float(1 << t)
        # gains i=2..6: bm over ba_bits bits of bb[i+1]
        for i in range(2, 7):
            nb = gain_bits[L9, i - 2]
            for t in range(nb):
                s = src[L9, i + 1, t]
                if s >= 0:
                    colT[L9, s] = 13 + (i - 2)
                    wT[L9, s] = float(1 << t)
        # HOC: slot (i, k-2) reads Bm bits of bb[m]
        m = 8
        for i in range(6):
            for k in range(2, Ji[L9, i] + 1):
                slot = i * 9 + (k - 2)
                Bm = hoba[L9, m - 8]
                m_valid[L9, i, k - 2] = Bm > 0
                if Bm > 0:
                    for t in range(Bm):
                        s = src[L9, m, t]
                        if s >= 0:
                            colT[L9, s] = 18 + slot
                            wT[L9, s] = float(1 << t)
                    hoc_qfac[L9, slot] = np.float32(qs[Bm - 1]) * np.float32(sd[k - 2])
                    hoc_off[L9, slot] = np.float32(2.0) ** np.float32(Bm - 1)
                m += 1

    # Tl block-IDCT factorization (imbe7200x4400.c:251-270):
    #   Midct[k-1, ji*10 + (j-1)] = ak * idct[ji][j][k]  (zero for j/k > ji)
    #   scl[L9, l] = i(l)*10 + (j(l)-1), -1 outside 1..L
    Midct = np.zeros((10, 110), np.float32)
    for ji in range(1, 11):
        for j in range(1, ji + 1):
            for k in range(1, ji + 1):
                ak = 1.0 if k == 1 else 2.0
                Midct[k - 1, ji * 10 + (j - 1)] = ak * idct[ji, j, k]
    scl = np.full((48, 57), -1, np.int32)
    for L9 in range(48):
        l = 1
        for i in range(6):
            for j in range(1, Ji[L9, i] + 1):
                scl[L9, l] = i * 10 + (j - 1)
                l += 1

    # Ri IDCT matrix: Ri[i] = sum_m am * Gm[m] * ri_cos[m][i], m,i in 1..6
    ri_cos = np.asarray(T.imbe_ri_cos)  # [7,7]
    RiM = np.zeros((6, 6), np.float32)  # [m-1, i-1]
    for m in range(1, 7):
        for i in range(1, 7):
            am = 1.0 if m == 1 else 2.0
            RiM[m - 1, i - 1] = am * ri_cos[m, i]

    # gain dequant constants: step and exp2f(nb-1)
    gain_step = ba[:, :, 1].astype(np.float32)        # [48, 5]
    gain_off = (2.0 ** (gain_bits - 1)).astype(np.float32)

    # Sparse incidence lists (round 3): the dense compare-reduces scan all
    # 72x88 (scatter) / 60x57 (Tl) / 12x57 (voicing) pairs, but the actual
    # incidence over the 48 variants is 5.6x / 4.8x / 2.7x sparser. Each
    # list enumerates, per output row, only the inputs ANY variant maps
    # there; dead pairs contribute exact zeros in the dense form, so
    # skipping them is bitwise free (scatter sums are integers — exact in
    # f32 in any order; Tl/voicing are exclusive selects).
    col_bits = []
    for col in range(NCOLS):
        col_bits.append(sorted({i for L9 in range(48) for i in range(88)
                                if colT[L9, i] == col}))

    # Packed-word scatter plan (round 4). The sparse compare-reduce scans
    # 1125 (col, bit) incidence pairs, but across all 48 variants there are
    # only 172 (col, t) field-bit SLOTS: slot (col, t) contributes bit t of
    # field col, reading ONE variant-dependent source position. Extracting
    # that bit with a per-lane variable shift from 3 packed int32 words is
    # a fixed ~8 VPU ops per slot — 6.5x fewer scatter terms. Unused
    # (variant, slot) entries point at bit 95: the packed words carry only
    # 88 bits, so the extracted bit is an exact 0 and no mask is needed.
    # Derived FROM colT/wT so the two formulations can't drift apart.
    #
    # Round 5: the packed positions use the FIELD-FORWARD layout (p88
    # below) instead of raw imbe_d index order. The hard frame path
    # already has every field as a packed integer (Golay/Hamming outputs,
    # imbe7200x4400.c:469-515); field-forward words assemble from those
    # with ~25 shift/or ops total, so the fused pipeline threads 3 int32
    # words straight from frame ECC to the scatter — no [88, C] bit-plane
    # expansion + re-pack round trip (VERDICT r4 #1). imbe_d[base+o] of
    # field f (length ln) is field bit (ln-1-o); packed position p88[j]
    # puts field bit t at base+t, so p88[base+o] = base + ln - 1 - o.
    p88 = np.zeros(88, np.int32)
    for base, ln in _FIELDS_7200:
        for o in range(ln):
            p88[base + o] = base + (ln - 1 - o)
    pos = np.full((48, NCOLS, 12), -1, np.int32)
    for g in range(48):
        for s in range(88):
            colv = colT[g, s]
            if colv < NCOLS:
                t = int(round(np.log2(wT[g, s])))
                pos[g, colv, t] = s
    slot_fixed = []   # (col, t, src): same source bit for every variant
    slot_var = []     # (col, t, word-index tuple) -> row of posT
    posT_rows = []
    for colv in range(NCOLS):
        for t in range(12):
            pv = pos[:, colv, t]
            if (pv < 0).all():
                continue
            if (pv >= 0).all() and len(set(pv.tolist())) == 1:
                slot_fixed.append((colv, t, int(p88[pv[0]])))
            else:
                row = np.where(pv >= 0, p88[pv], 95)
                slot_var.append(
                    (colv, t, tuple(sorted({int(x) // 32 for x in row}))))
                posT_rows.append(row.astype(np.float32))
    posT = (np.stack(posT_rows) if posT_rows
            else np.zeros((0, 48), np.float32))  # [Sv, 48], values <= 95
    # fallback plane->words pack groups (staged-API callers that hand the
    # decode bit planes): word wd collects bits j with p88[j]//32 == wd
    pack_groups = []
    for wd in range(3):
        sel = np.where(p88 // 32 == wd)[0].astype(np.int32)
        pack_groups.append((sel, (p88[sel] % 32).astype(np.int32)))
    band_slots = []
    for l in range(57):
        band_slots.append(sorted({int(s) for s in scl[:, l] if s >= 0}))
    band_ts = []
    for l in range(57):
        if l == 0:
            band_ts.append([])
            continue
        band_ts.append(sorted({int(min(max(K_of[L9] - 1 - (l - 1) // 3, 0),
                                       11)) for L9 in range(48)}))

    return dict(
        NCOLS=NCOLS, colT=colT.astype(np.float32), wT=wT,
        Midct=Midct, scl=scl.astype(np.float32),
        Ji=np.ascontiguousarray(Ji.astype(np.float32)), RiM=RiM,
        m_valid=m_valid.reshape(48, 54),
        hoc_qfac=hoc_qfac, hoc_off=hoc_off,
        gain_step=gain_step, gain_off=gain_off,
        col_bits=col_bits, band_slots=band_slots, band_ts=band_ts,
        slot_fixed=slot_fixed, slot_var=slot_var, posT=posT,
        pack_groups=pack_groups, L_by_b0=L_by_b0)


def pack_imbe_words(imbe_d):
    """[88, C] int32 bit planes -> 3 field-forward packed int32 words [C].

    Staged-API fallback: the fused hard pipeline assembles these words
    directly from the packed ECC outputs (_words_from_fields_7200) and
    never touches bit planes."""
    tb = _decode_tables()
    d_i = imbe_d.astype(jnp.int32)
    words = []
    for sel, sh in tb["pack_groups"]:
        # 1<<31 wraps to INT32_MIN by design (bit pattern is what matters)
        words.append(jnp.sum(d_i[jnp.asarray(sel)]
                             << jnp.asarray(sh)[:, None], axis=0))
    return tuple(words)


def _words_from_fields_7200(c0d, g0, g1, g2, h0, h1, h2, raw7):
    """Assemble the 3 field-forward packed words from per-field packed
    integers (12/12/12/12/11/11/11/7 bits, already shifted to bit 0)."""
    w0 = c0d | (g0 << 12) | ((g1 & 0xFF) << 24)
    w1 = (g1 >> 8) | (g2 << 4) | (h0 << 16) | ((h1 & 0x1F) << 27)
    w2 = (h1 >> 5) | (h2 << 6) | (raw7 << 17)
    return w0, w1, w2


def expand_imbe_d(words):
    """Field-forward packed words -> [88, C] int32 imbe_d bit planes
    (exactly the layout of imbe7200x4400.c:469-515). Only built where a
    caller actually consumes bit planes (the staged API surface); the
    fused pipeline threads the words."""
    w0, w1, w2 = words
    f0 = w0 & 0xFFF
    f1 = (w0 >> 12) & 0xFFF
    f2 = ((w0 >> 24) & 0xFF) | ((w1 & 0xF) << 8)
    f3 = (w1 >> 4) & 0xFFF
    f4 = (w1 >> 16) & 0x7FF
    f5 = ((w1 >> 27) & 0x1F) | ((w2 & 0x3F) << 5)
    f6 = (w2 >> 6) & 0x7FF
    f7 = (w2 >> 17) & 0x7F
    parts = []
    for field, (_, ln) in zip((f0, f1, f2, f3, f4, f5, f6, f7),
                              _FIELDS_7200):
        parts.append(_extract_bits(field, ln - 1, 0))
    return jnp.concatenate(parts, axis=0)


def _b0_from_words_7200(words):
    """b0 (8-bit fundamental index) from the field-forward packed words:
    imbe_d[0..5] live at w0 bits 11..6 and imbe_d[85..86] at w2 bits
    19..18, so the MSB-first sum collapses to two masks and a shift."""
    w0, _, w2 = words
    return (((w0 >> 6) & 63) << 2) | ((w2 >> 18) & 3)


def _onehot_select(onehot, table2d, out_shape):
    """MXU gather replacement: rows of table2d selected by onehot [C, G]."""
    sel = jnp.matmul(onehot, jnp.asarray(table2d),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return sel.reshape((onehot.shape[0],) + out_shape)


def decode_imbe4400_parms(imbe_d, cur: Parms, prev: Parms, words=None):
    """Batched mbe_decodeImbe4400Parms (imbe7200x4400.c:589-630).

    Args: imbe_d [88, C] int32 parameter bits (channel-minor); words —
    optional field-forward packed form (3x [C] int32, see pack_imbe_words).
    When the fused hard pipeline supplies `words`, the bit planes are never
    read on the packed-scatter path (XLA dead-code-eliminates the [88, C]
    expansion), killing the plane->word round trip (VERDICT r4 #1).
    Returns: (cur', prev', bad [C] int32) — bad==1 lanes leave all state
    untouched (invalid fundamental, imbe7200x4400.c:117-130).
    """
    tb = _decode_tables()
    c = imbe_d.shape[1]
    hp = jax.lax.Precision.HIGHEST
    packed_scatter = os.environ.get("MBE_TPU_IMBE_SCATTER",
                                    "batched") != "pairs"

    if packed_scatter and words is None:
        words = pack_imbe_words(imbe_d)

    if packed_scatter:
        b0 = _b0_from_words_7200(words)
    else:
        dT = imbe_d.astype(jnp.float32)  # [88, C]
        wts = jnp.asarray(
            (1 << np.arange(len(_B0_IDX) - 1, -1, -1)).astype(np.int32))
        b0 = jnp.sum(dT[jnp.asarray(_B0_IDX), :].astype(jnp.int32)
                     * wts[:, None], axis=0)
    bad = (b0 > 207).astype(jnp.int32)
    b0s = jnp.clip(b0, 0, 207)

    # b0-indexed tables via fused compare-reduce (bits.lut1d): dynamic
    # gathers cost ~0.25 ms per [C]-shaped take at C=32768
    w0 = bit_ops.lut1d(b0s, np.asarray(T.imbe_w0_by_b0, np.float32))
    L = bit_ops.lut1d(b0s, np.asarray(T.imbe_L_by_b0, np.int32))
    K = bit_ops.lut1d(b0s, np.asarray(T.imbe_K_by_b0, np.int32))
    L9 = L - 9
    onehotT = (L9[None, :] == jnp.arange(48, dtype=jnp.int32)[:, None]
               ).astype(jnp.float32)  # [48, C]

    # --- all bit-layout reads of the bb[58][12] scatter ---------------------
    # (imbe7200x4400.c:156-168 and every bits_descending read; values are
    # exact small integers). Two bit-exact formulations, switched at trace
    # time; "packed" is the round-4 winner (see docs/PERFORMANCE.md):
    #   packed — pack the 88 bits into 3 int32 words, then extract each of
    #     the 172 (col, t) field-bit slots with a per-lane variable shift;
    #     the variant-dependent source position comes from one tiny
    #     [Sv,48]@[48,C] one-hot matmul (positions <= 95, exact in bf16).
    #   pairs — round-3 sparse compare-reduce over the 1125 (col, bit)
    #     incidence pairs (per-bit col/weight selects + where-sums).
    onehot_bf = onehotT.astype(jnp.bfloat16)
    if not packed_scatter:
        colsel = jnp.matmul(jnp.asarray(tb["colT"], jnp.bfloat16).T,
                            onehot_bf,
                            preferred_element_type=jnp.float32)  # [88, C]
        wsel = jnp.matmul(jnp.asarray(tb["wT"], jnp.bfloat16).T, onehot_bf,
                          preferred_element_type=jnp.float32)
        p = wsel * dT
        # (Storing p/colsel as bf16 to halve the re-read traffic measured
        # 0.964x end-to-end — the scatter is VPU-issue bound, not
        # HBM-bound, and bf16 lanes add convert work. 2026-08-19.)
        rows = []
        for col, ii in enumerate(tb["col_bits"]):
            idx = jnp.asarray(np.asarray(ii, np.int32))
            sel = jnp.where(colsel[idx, :] == jnp.float32(col),
                            p[idx, :], 0.0)
            rows.append(jnp.sum(sel, axis=0, keepdims=True))
        vals = jnp.concatenate(rows, axis=0)                 # [72, C]
    elif os.environ.get("MBE_TPU_IMBE_SCATTER", "batched") == "batched":
        # Round 5: the row-loop form below runs ~860 ops on [1, C] rows at
        # 1/8 sublane occupancy (the round-5 Tl-select lesson). Batched:
        # ONE [S, C] tile chain extracts all 172 slots lane-dense — the
        # generic 3-way word select on the position is correct for every
        # slot (the position determines the word) — and the static
        # slot->column segment sum runs as an exact one-hot MXU matmul:
        # every contribution is 0 or 2^t (t <= 11, exact in bf16), sums
        # < 2^13 accumulate in f32. Bit-identical to the row loop.
        pn_all = jnp.matmul(jnp.asarray(tb["posT"], jnp.bfloat16),
                            onehot_bf,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.int32)  # [Sv, C]
        pos_f = np.asarray([s for (_, _, s) in tb["slot_fixed"]], np.int32)
        t_all = np.asarray([t for (_, t, _) in tb["slot_fixed"]]
                           + [t for (_, t, _) in tb["slot_var"]], np.int32)
        cols = ([cv for (cv, _, _) in tb["slot_fixed"]]
                + [cv for (cv, _, _) in tb["slot_var"]])
        Mcol = np.zeros((tb["NCOLS"], len(cols)), np.float32)
        Mcol[cols, np.arange(len(cols))] = 1.0
        pos_full = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(pos_f)[:, None],
                              (len(pos_f), c)), pn_all], axis=0)  # [S, C]
        wsel_w = jnp.where(pos_full < 32, words[0][None, :],
                           jnp.where(pos_full < 64, words[1][None, :],
                                     words[2][None, :]))
        # sentinel 95 lands in word 2 bit 31 == 0 (only 24 bits live)
        shifted = (((wsel_w >> (pos_full & 31)) & 1)
                   << jnp.asarray(t_all)[:, None])
        vals = jnp.matmul(jnp.asarray(Mcol, jnp.bfloat16),
                          shifted.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)   # [72, C]
    else:
        pn_all = jnp.matmul(jnp.asarray(tb["posT"], jnp.bfloat16),
                            onehot_bf,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.int32)  # [Sv, C]
        acc = [None] * tb["NCOLS"]

        def _add(colv, bit, t):
            contrib = bit if t == 0 else (bit << t)
            acc[colv] = contrib if acc[colv] is None else acc[colv] + contrib

        for colv, t, src in tb["slot_fixed"]:
            _add(colv, (words[src // 32] >> (src % 32)) & 1, t)
        for vi, (colv, t, wset) in enumerate(tb["slot_var"]):
            pn = pn_all[vi]
            if len(wset) == 1:
                wsel_w = words[wset[0]]
            elif len(wset) == 2:
                wsel_w = jnp.where(pn < 32 * wset[1],
                                   words[wset[0]], words[wset[1]])
            else:
                wsel_w = jnp.where(pn < 32, words[0],
                                   jnp.where(pn < 64, words[1], words[2]))
            # sentinel 95 lands in word 2 bit 31 == 0 (only 24 bits live)
            _add(colv, (wsel_w >> (pn & 31)) & 1, t)
        vals = jnp.concatenate(
            [a[None, :] if a is not None else jnp.zeros((1, c), jnp.int32)
             for a in acc], axis=0).astype(jnp.float32)      # [72, C]

    # --- voicing (imbe7200x4400.c:170-188) --------------------------------
    # Vl[l] = bb[1][max(K-1-(l-1)/3, 0)]: expand the 12 bb[1] source bits
    # with the t(l) index computed arithmetically per lane.
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    tl_idx = jnp.clip(K[None, :] - 1 - (li - 1) // 3, 0, 11)
    bb1 = vals[:12]
    if os.environ.get("MBE_TPU_BAND_SELECT", "dense") == "pairs":
        # sparse per-band select: band l can only read the few t values K's
        # 10 possible settings produce (245 pairs vs the dense 12x57)
        vl_rows = [jnp.zeros((1, c), jnp.float32)]  # band 0 unused
        for l in range(1, 57):
            row = jnp.zeros((1, c), jnp.float32)
            for t in tb["band_ts"][l]:
                row = jnp.where(tl_idx[l:l + 1, :] == t, bb1[t:t + 1, :], row)
            vl_rows.append(row)
        vl_f = jnp.concatenate(vl_rows, axis=0)
    else:
        # dense-by-t: 12 full-width [57, C] selects. The 245-pair sparse
        # chain runs on [1, C] rows at 1/8 sublane occupancy (measured
        # 0.165 ms/step at C=32768 in the round-4 xprof); 12 selects over
        # the whole [57, C] block do strictly more element-ops but at full
        # vreg density. Every lane matches exactly one t (tl_idx is
        # clipped to 0..11), so this is bitwise identical on rows >= 1;
        # row 0 picks up bb1[clip(K, 0, 11)] instead of 0, and is
        # discarded by band_mask below (sole consumer).
        vl_f = jnp.zeros((57, c), jnp.float32)
        for t in range(12):
            vl_f = jnp.where(tl_idx == t, bb1[t:t + 1, :], vl_f)
    vl_bits = vl_f.astype(jnp.int32)  # [57, C]
    band_mask = (li >= 1) & (li <= L[None, :])
    Vl = jnp.where(band_mask, vl_bits, cur.Vl)

    # --- gains (imbe7200x4400.c:190-209) ----------------------------------
    b2 = vals[12].astype(jnp.int32)
    Gm1 = bit_ops.lut1d(b2, np.asarray(T.B2, np.float32))
    gain_step = jnp.matmul(jnp.asarray(tb["gain_step"]).T, onehotT,
                           precision=hp,
                           preferred_element_type=jnp.float32)  # [5, C]
    gain_off = jnp.matmul(jnp.asarray(tb["gain_off"]).T, onehotT,
                          precision=hp, preferred_element_type=jnp.float32)
    Gm_rest = gain_step * ((vals[13:18] - gain_off) + jnp.float32(0.5))
    Gm = jnp.concatenate([Gm1[None, :], Gm_rest], axis=0)  # [6, C]

    # --- Ri = 6-pt IDCT (imbe7200x4400.c:211-231) -------------------------
    Ri = jnp.matmul(jnp.asarray(tb["RiM"]).T, Gm, precision=hp,
                    preferred_element_type=jnp.float32)  # [6, C]

    # --- HOC coefficients (imbe7200x4400.c:233-249) ------------------------
    qfac = jnp.matmul(jnp.asarray(tb["hoc_qfac"]).T, onehotT, precision=hp,
                      preferred_element_type=jnp.float32)  # [54, C]
    off = jnp.matmul(jnp.asarray(tb["hoc_off"]).T, onehotT, precision=hp,
                     preferred_element_type=jnp.float32)
    valid = jnp.matmul(jnp.asarray(tb["m_valid"].astype(np.float32)).T,
                       onehotT, precision=hp,
                       preferred_element_type=jnp.float32) > 0.5
    hoc = qfac * ((vals[18:72] - off) + jnp.float32(0.5))
    hoc = jnp.where(valid, hoc, 0.0).reshape(6, 9, c)

    # Cik in (i, k-1) layout: k=1 -> Ri, k>=2 -> hoc
    Cik = jnp.concatenate([Ri.reshape(6, 1, c), hoc], axis=1)  # [6, 10, C]

    # --- Tl via factored block-IDCT (imbe7200x4400.c:251-270) -------------
    # Usel[i,j,c] = sum_k Cik[i,k,c] * Midct[k, ji*10+j] with the per-block
    # size ji = Ji[L9,i]. The block sizes have spread exactly 1
    # (Ji[L9,i] = L//6 + (i >= 6-L%6)), so two per-channel [100]-wide
    # matrices (lo/hi, gathered once via 9 shared compares) and one boolean
    # per-block select inside the ascending-k accumulation replace both the
    # big all-sizes intermediate and a 55-way per-(c,i) select chain.
    # Ascending-k sum like the reference's inner loop
    # (imbe7200x4400.c:259-264); same cosf-table values.
    M3 = np.asarray(tb["Midct"]).reshape(10, 11, 10)  # [k, ji, j]
    M100 = np.ascontiguousarray(M3.transpose(1, 0, 2).reshape(11, 100))
    lo = jnp.floor_divide(L, 6)
    lof = lo.astype(jnp.float32)[None, :]  # [1, C]
    nlo = (6 - (L - 6 * lo))[None, :]      # first nlo blocks have size lo
    ehi = jnp.arange(6, dtype=jnp.int32)[:, None] >= nlo  # [6, C]
    if os.environ.get("MBE_TPU_IMBE_MIDCT", "matmul") == "where":
        # round-3 form: 9x2 where passes over [100, C]
        Mlo = jnp.zeros((100, c), jnp.float32)
        Mhi = jnp.zeros((100, c), jnp.float32)
        for v in range(1, 10):
            mv = lof == jnp.float32(v)
            Mlo = jnp.where(mv, jnp.asarray(M100[v])[:, None], Mlo)
            Mhi = jnp.where(mv, jnp.asarray(M100[v + 1])[:, None], Mhi)
    else:
        # round 5: the per-channel row gather M100[v(c)] as one-hot MXU
        # matmuls — exact (one 1.0 per column, other products are 0*x,
        # and x + 0 == x in f32), and it retires 18 [100, C] VPU select
        # passes. v outside [1, 9] (erasure lanes) gives all-zero columns,
        # matching the where-chain's zeros.
        onehot_v = (jnp.arange(1, 10, dtype=jnp.float32)[:, None]
                    == lof).astype(jnp.float32)  # [9, C]
        Mlo = jnp.matmul(jnp.asarray(M100[1:10]).T, onehot_v, precision=hp,
                         preferred_element_type=jnp.float32)  # [100, C]
        Mhi = jnp.matmul(jnp.asarray(M100[2:11]).T, onehot_v, precision=hp,
                         preferred_element_type=jnp.float32)
    ehx = ehi[:, None, :]  # [6, 1, C]
    Usel = jnp.zeros((6, 10, c), jnp.float32)
    for k in range(10):
        wk = jnp.where(ehx, Mhi[10 * k:10 * k + 10][None, :, :],
                       Mlo[10 * k:10 * k + 10][None, :, :])
        Usel = Usel + Cik[:, k, :][:, None, :] * wk
    Usel = Usel.reshape(60, c)
    # scl is a small-integer table (<= 59): exact in bf16, so the one-hot
    # row gather runs 1-pass on the MXU instead of HIGHEST's 6.
    scl = jnp.matmul(jnp.asarray(tb["scl"], jnp.bfloat16).T,
                     onehotT.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # [57, C]
    # each band l reads exactly one slot, and only ~12 of the 60 slots are
    # reachable per band across the 48 variants (720 pairs vs dense 60x57).
    # Round 5: the per-band [1, C] select rows ran at 1/8 sublane occupancy
    # (xprof: 0.124 ms/step at C=32768 as 43 row ops) — grouping bands into
    # 8-sublane tiles selects over the UNION of the 8 bands' candidate
    # slots (~20 per group) at full vreg density, ~160 [8, C] ops total.
    # Bitwise identical: scl rows outside a band's own candidate set never
    # match, so the extra compares select nothing.
    tl_tiles = []
    for g in range(8):
        lo, hi = 8 * g, min(8 * g + 8, 57)
        cands = sorted({s for l in range(max(lo, 1), hi)
                        for s in tb["band_slots"][l]})
        seg = jnp.zeros((hi - lo, c), jnp.float32)
        for sl in cands:
            # band 0 stays exactly zero: scl[*, 0] == -1 never matches
            seg = jnp.where(scl[lo:hi, :] == jnp.float32(sl),
                            Usel[sl:sl + 1, :], seg)
        tl_tiles.append(seg)
    Tl = jnp.concatenate(tl_tiles, axis=0)

    # --- spectral amplitude prediction (imbe7200x4400.c:272-354) ----------
    rho = jnp.where(L <= 15, jnp.float32(0.4),
                    jnp.where(L <= 24,
                              jnp.float32(0.03) * L.astype(jnp.float32)
                              - jnp.float32(0.05),
                              jnp.float32(0.7)))
    Ml_n, log2_n, pM, pLg, cL = spectral.spectral_update(
        L, prev.L, prev.Ml, prev.log2Ml, Tl, weight=rho,
        cur_Ml=cur.Ml, cur_log2Ml=cur.log2Ml)

    ok = (bad == 0)
    okc = ok[None, :]
    cur_out = dataclasses.replace(
        cur,
        w0=jnp.where(ok, w0, cur.w0),
        L=jnp.where(ok, cL, cur.L),
        K=jnp.where(ok, K, cur.K),
        Vl=jnp.where(okc, Vl, cur.Vl),
        Ml=jnp.where(okc, Ml_n, cur.Ml),
        log2Ml=jnp.where(okc, log2_n, cur.log2Ml))
    prev_out = dataclasses.replace(
        prev,
        Ml=jnp.where(okc, pM, prev.Ml),
        log2Ml=jnp.where(okc, pLg, prev.log2Ml))
    return cur_out, prev_out, bad


# ---------------------------------------------------------------------------
# Frame-level ECC / demod (imbe7200x4400.c:424-744, imbe7100x4400.c:99-516)
# ---------------------------------------------------------------------------

def _extract_bits(word, hi, lo):
    """[hi-lo+1, C] bits of a packed word [C], MSB (bit `hi`) first
    (channel-minor: bit index on the leading axis)."""
    shifts = jnp.arange(hi, lo - 1, -1, dtype=jnp.int32)[:, None]
    return (word[None, :] >> shifts) & 1


def decode_imbe7200_frame(frame, soft_rel=None, return_words=False):
    """Batched mbe_decodeImbe7200x4400[Soft]Frame.

    Args:
      frame: [C, 8, 23] int32 bitplanes (hard bits, or soft hard-decisions).
      soft_rel: [C, 8, 23] int32 reliabilities, or None for the hard path.
      return_words: also return the field-forward packed 88-bit words
        (hard path only) so the fused pipeline can thread them straight
        into the parameter decode — the [88, C] bit-plane expansion then
        only materializes where a caller actually reads it.
    Returns:
      (imbe_d [88, C] channel-minor, c0/protected/c4 errors [C] each
       [, words (w0, w1, w2) when return_words])

    The hard path is fully packed-word: each row lives in one int32 lane
    (demod keystream included, ops/demod.prng_keywords), so the whole
    ECC/demod stage is lane-dense int math with NO bit-plane tensors at
    all ([.., 23]-shaped tensors waste 4/5 of each VPU row). The soft
    path needs per-bit reliabilities and stays bit-plane, with the 3
    Golay / 3 Hamming blocks batched into one decode each.
    """
    f = frame.astype(jnp.int32)
    if soft_rel is not None:
        assert not return_words  # soft path has no packed-word form
        return _decode_imbe7200_frame_soft(f, soft_rel)

    # pack rows channel-major (one lane reduce), then ONE tiny [C,8]
    # transpose puts the whole ECC/demod stage channel-minor: every packed
    # word row is a dense [C] lane vector and the 3-word Golay/Hamming
    # batches run on [3, C] (full lanes) instead of [C, 3] (3/128).
    w = jnp.sum(f * jnp.asarray(_POW2_23), axis=-1).T  # [8, C] packed rows
    c0w, c0_errs = ecc.golay2312_hard_packed(w[0])

    # demod PRNG seeded by C0 data bits 22..11 (imbe7200x4400.c:648-656)
    seed = 16 * (c0w >> 11)
    kw = demod.prng_keywords(seed, (23, 23, 23, 15, 15, 15))  # [6, C]

    g_out, g_errs = ecc.golay2312_hard_packed(w[1:4] ^ kw[0:3])
    h_out, h_errs = ecc.hamming1511_hard_packed((w[4:7] & 0x7FFF) ^ kw[3:6])
    perrs = jnp.sum(g_errs, axis=0) + jnp.sum(h_errs, axis=0)
    c4_errs = h_errs[0]

    # 88-bit packing (imbe7200x4400.c:469-515) straight into the 3
    # field-forward words (~25 shift/or lane ops, no [88, C] planes)
    words = _words_from_fields_7200(
        (c0w >> 11) & 0xFFF,
        (g_out[0] >> 11) & 0xFFF, (g_out[1] >> 11) & 0xFFF,
        (g_out[2] >> 11) & 0xFFF,
        (h_out[0] >> 4) & 0x7FF, (h_out[1] >> 4) & 0x7FF,
        (h_out[2] >> 4) & 0x7FF,
        w[7] & 0x7F)
    imbe_d = expand_imbe_d(words)                    # [88, C]
    if return_words:
        return imbe_d, c0_errs, perrs, c4_errs, words
    return imbe_d, c0_errs, perrs, c4_errs


def _decode_imbe7200_frame_soft(f, soft_rel):
    c0_out, c0_errs = ecc.golay2312_soft(f[:, 0, :], soft_rel[:, 0, :])

    # demod PRNG seeded by C0 bits 22..11 (imbe7200x4400.c:648-656)
    seed = 16 * bit_ops.pack_descending(c0_out, 22, 11)
    pr = demod.prng_bits(seed, 114).T  # [C, 114] (soft path is major)

    # rows 1..3 bits 22..0, rows 4..6 bits 14..0 XORed with keystream
    k = 0
    rows = [c0_out]
    for i in range(1, 4):
        key = pr[:, k:k + 23][:, ::-1]  # applied j=22..0
        rows.append(f[:, i, :] ^ key)
        k += 23
    for i in range(4, 7):
        key = pr[:, k:k + 15][:, ::-1]
        rows.append(f[:, i, :15] ^ key)
        k += 15
    row7 = f[:, 7, :]

    # data ECC + 88-bit packing (imbe7200x4400.c:469-515): demodulation
    # flips hard decisions, keeps reliabilities; blocks batch 3-at-a-time
    g_in = jnp.stack(rows[1:4], axis=1)  # [C, 3, 23]
    h_in = jnp.stack(rows[4:7], axis=1)  # [C, 3, 15]
    g_out, g_errs = ecc.golay2312_soft(g_in, soft_rel[:, 1:4, :])
    h_out, h_errs = ecc.hamming1511_soft(h_in, soft_rel[:, 4:7, :15])
    perrs = jnp.sum(g_errs, axis=1) + jnp.sum(h_errs, axis=1)
    c4_errs = h_errs[:, 0]

    dparts = [rows[0][:, 22:10:-1]]  # C0 data bits 22..11 (12 bits)
    for i in range(3):
        dparts.append(g_out[:, i, 22:10:-1])
    for i in range(3):
        dparts.append(h_out[:, i, 14:3:-1])  # bits 14..4 (11 bits)
    dparts.append(row7[:, 6::-1])  # 7 bits 6..0
    # the soft path stays bit-plane channel-major (its dominant [*, 4096]
    # score tensors are already lane-perfect); one [C,88] transpose hands
    # the result to the channel-minor decode stage
    imbe_d = jnp.concatenate(dparts, axis=-1).T  # [88, C]
    return imbe_d, c0_errs, perrs, c4_errs


@lru_cache(maxsize=1)
def _conv7100_tables():
    """mbe_convertImbe7100to7200 (imbe7100x4400.c:380-437) as a per-K
    gather permutation: out[j] = in[perm[K][j]] for the 88-bit vector."""
    perms = np.zeros((13, 88), np.int32)
    for K in range(1, 13):
        dst = np.zeros(88, np.int32)
        dst[87] = 0
        dst[48 + K] = 42
        dst[49 + K] = 43
        k = 44
        j = 48
        for _ in range(K):
            dst[j] = k
            j += 1
            k += 1
        j = 0
        k = 1
        while j < 87:
            dst[j] = k
            j += 1
            if j == 48:
                j += K + 2
            k += 1
            if k == 42:
                k += K + 2
        perms[K] = dst
    return perms


@lru_cache(maxsize=1)
def _conv7100_shift_tables():
    """The 12 K-variant permutations as per-output-bit (word, shift) pairs
    over a 3x-int32 packed representation: out[j] = in[perm[K][j]] becomes
    `(word[sw[K,j]] >> sb[K,j]) & 1` — per-lane variable shifts are native
    VPU ops, so the whole convert is ~8 elementwise ops per output bit."""
    perms = _conv7100_tables()
    sw = np.zeros((12, 88), np.float32)   # source word index (0..2)
    sb = np.zeros((12, 88), np.int32)     # source bit-in-word (0..31)
    for K in range(1, 13):
        sw[K - 1] = perms[K] // 32
        sb[K - 1] = perms[K] % 32
    return sw, sb.astype(np.float32)


@lru_cache(maxsize=1)
def _conv7100_packed_tables():
    """The 12 K-variant 7100->7200 permutations in PACKED space: output
    field-forward 7200 position q reads 7100-packed position
    p71[perm[K][p72[q]]] (both layout maps are involutions). Emitting
    (word, shift) pairs per output position lets the convert run packed
    words -> packed words with no [88, C] bit planes on either side."""
    perms = _conv7100_tables()
    p72 = np.zeros(88, np.int32)
    for base, ln in _FIELDS_7200:
        for o in range(ln):
            p72[base + o] = base + (ln - 1 - o)
    p71 = np.zeros(88, np.int32)
    for base, ln in _FIELDS_7100:
        for o in range(ln):
            p71[base + o] = base + (ln - 1 - o)
    sw = np.zeros((12, 88), np.float32)   # source word index (0..2)
    sb = np.zeros((12, 88), np.float32)   # source bit-in-word (0..31)
    for K in range(1, 13):
        sp = p71[perms[K][p72]]
        sw[K - 1] = sp // 32
        sb[K - 1] = sp % 32
    return sw, sb


def _b0_from_words_7100(words):
    """b0 from 7100-layout field-forward packed words: bits 1..6 of the
    pre-convert imbe_d live at w0 bits 5..0 and bits 86..87 at w2 bits
    2..1 (imbe7100x4400.c:389-395)."""
    w0, _, w2 = words
    return ((w0 & 63) << 2) | ((w2 >> 1) & 3)


def convert_7100_to_7200_packed(words):
    """mbe_convertImbe7100to7200 on field-forward packed words (3x [C]
    int32 in, 3x [C] int32 out): per output bit one 3-way word select +
    per-lane variable shift, then a shift-or back into the output words.
    Bit-exact (pure integer ops)."""
    K = bit_ops.lut1d(jnp.clip(_b0_from_words_7100(words), 0, 207),
                      np.asarray(T.imbe_K_by_b0, np.int32))
    sw_t, sb_t = _conv7100_packed_tables()
    kh = (jnp.clip(K, 1, 12)[None, :] ==
          jnp.arange(1, 13, dtype=jnp.int32)[:, None]
          ).astype(jnp.float32)  # [12, C]
    hp = jax.lax.Precision.HIGHEST
    sw = jnp.matmul(jnp.asarray(sw_t).T, kh, precision=hp,
                    preferred_element_type=jnp.float32)  # [88, C]
    sb = jnp.matmul(jnp.asarray(sb_t).T, kh, precision=hp,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    w0, w1, w2 = words
    word = jnp.where(sw == 0.0, w0[None, :],
                     jnp.where(sw == 1.0, w1[None, :], w2[None, :]))
    bits = (word >> sb) & 1  # [88, C], row q = output packed position q
    shifts = jnp.arange(32, dtype=jnp.int32)[:, None]
    return (jnp.sum(bits[0:32] << shifts, axis=0),
            jnp.sum(bits[32:64] << shifts, axis=0),
            jnp.sum(bits[64:88] << shifts[:24], axis=0))


def convert_7100_to_7200(imbe_d):
    """Batched mbe_convertImbe7100to7200 (imbe7100x4400.c:380-437).

    Per-channel gathers through perm[K] are ~10x slower on TPU than lane
    math, and the earlier all-12-permutations one-hot einsum materialized
    a [12, C, 88] product tensor (138 MB at C=32768). Instead the 88 bits
    pack into three int32 words per lane and each output bit is a 3-way
    word select + per-lane variable shift, with the (word, shift) layout
    tables selected by a tiny one-hot matmul over the 12 K variants.
    Bit-exact (pure integer ops). imbe_d: [88, C] channel-minor."""
    d = imbe_d.astype(jnp.int32)
    b0idx = jnp.asarray(np.array([1, 2, 3, 4, 5, 6, 86, 87], np.int32))
    wts = jnp.asarray((1 << np.arange(7, -1, -1)).astype(np.int32))
    b0 = jnp.sum(d[b0idx, :] * wts[:, None], axis=0)
    b0s = jnp.clip(b0, 0, 207)
    K = bit_ops.lut1d(b0s, np.asarray(T.imbe_K_by_b0, np.int32))

    shifts = jnp.arange(32, dtype=jnp.int32)[:, None]
    w0 = jnp.sum(d[0:32, :] << shifts, axis=0)
    w1 = jnp.sum(d[32:64, :] << shifts, axis=0)
    w2 = jnp.sum(d[64:88, :] << shifts[:24], axis=0)

    sw_t, sb_t = _conv7100_shift_tables()
    kh = (jnp.clip(K, 1, 12)[None, :] ==
          jnp.arange(1, 13, dtype=jnp.int32)[:, None]
          ).astype(jnp.float32)  # [12, C]
    hp = jax.lax.Precision.HIGHEST
    sw = jnp.matmul(jnp.asarray(sw_t).T, kh, precision=hp,
                    preferred_element_type=jnp.float32)  # [88, C]
    sb = jnp.matmul(jnp.asarray(sb_t).T, kh, precision=hp,
                    preferred_element_type=jnp.float32).astype(jnp.int32)

    word = jnp.where(sw == 0.0, w0[None, :],
                     jnp.where(sw == 1.0, w1[None, :], w2[None, :]))
    return (word >> sb) & 1


def decode_imbe7100_frame(frame, soft_rel=None, return_words=False):
    """Batched mbe_decodeImbe7100x4400[Soft]Frame (imbe7100x4400.c:439-516).

    frame: [C, 7, 24] int32. Returns (imbe_d [88, C] in 7200 layout, c0,
    protected, c4 errors [, packed words when return_words]). Hard path
    is packed-word channel-minor end-to-end including the 7100->7200
    convert (see decode_imbe7200_frame)."""
    f = frame.astype(jnp.int32)
    if soft_rel is not None:
        assert not return_words
        return _decode_imbe7100_frame_soft(f, soft_rel)

    w = jnp.sum(f * jnp.asarray(_POW2_24), axis=-1).T  # [7, C] packed rows

    # C0: short Golay — 18 data bits at fr[0][1..18], zero-padded to 23
    c0w_in = (w[0] >> 1) & 0x3FFFF
    c0w, c0_errs = ecc.golay2312_hard_packed(c0w_in)
    # write corrected bits 0..17 back into fr[0][1..18]
    fr0 = (w[0] & ~jnp.int32(0x3FFFF << 1)) | ((c0w & 0x3FFFF) << 1)

    # demod PRNG seeded by fr[0] bits 18..12 (imbe7100x4400.c:302-311)
    seed = 16 * ((fr0 >> 12) & 0x7F)
    kw = demod.prng_keywords(seed, (24, 23, 23, 15, 15))  # [5, C]

    rw1 = (w[1] & 0xFFFFFF) ^ kw[0]
    g_in = jnp.stack([(rw1 >> 1) & 0x7FFFFF,
                      (w[2] & 0x7FFFFF) ^ kw[1],
                      (w[3] & 0x7FFFFF) ^ kw[2]], axis=0)
    h_in = (w[4:6] & 0x7FFF) ^ kw[3:5]
    g_out, g_errs = ecc.golay2312_hard_packed(g_in)
    h_out, h_errs = ecc.hamming1511_hard_packed(h_in, variant7100=True)
    perrs = jnp.sum(g_errs, axis=0) + jnp.sum(h_errs, axis=0)
    c4_errs = h_errs[0]

    # 88-bit packing (imbe7100x4400.c:313-378) straight into the 3
    # field-forward 7100-layout words, converted packed->packed
    g0d = (fr0 >> 12) & 0x7F
    g1d = (g_out[0] >> 11) & 0xFFF
    g2d = (g_out[1] >> 11) & 0xFFF
    g3d = (g_out[2] >> 11) & 0xFFF
    g4d = (h_out[0] >> 4) & 0x7FF
    g5d = (h_out[1] >> 4) & 0x7FF
    g6d = w[6] & 0x7FFFFF
    w71 = (g0d | (g1d << 7) | (g2d << 19) | ((g3d & 1) << 31),
           (g3d >> 1) | (g4d << 11) | ((g5d & 0x3FF) << 22),
           (g5d >> 10) | (g6d << 1))
    words = convert_7100_to_7200_packed(w71)
    imbe_d = expand_imbe_d(words)
    if return_words:
        return imbe_d, c0_errs, perrs, c4_errs, words
    return imbe_d, c0_errs, perrs, c4_errs


def _decode_imbe7100_frame_soft(f, soft_rel):
    c = f.shape[0]

    # C0: short Golay — 18 data bits at fr[0][1..18], padded with 5 zeros
    zeros5 = jnp.zeros((c, 5), jnp.int32)
    g_in = jnp.concatenate([f[:, 0, 1:19], zeros5], axis=-1)
    rel5 = jnp.full((c, 5), 255, jnp.int32)
    g_rel = jnp.concatenate([soft_rel[:, 0, 1:19], rel5], axis=-1)
    c0_out, c0_errs = ecc.golay2312_soft(g_in, g_rel)
    # write back corrected bits 0..17 into fr[0][1..18] positions
    fr0 = jnp.concatenate([f[:, 0, :1], c0_out[:, :18], f[:, 0, 19:]], axis=-1)

    # demod PRNG seeded by fr[0] bits 18..12 (imbe7100x4400.c:302-311)
    seed = 16 * bit_ops.pack_descending(fr0, 18, 12)
    pr = demod.prng_bits(seed, 100).T  # [C, 100] (soft path is major)

    row1 = f[:, 1, :] ^ pr[:, 0:24][:, ::-1]
    k = 24
    rows23 = []
    for i in range(2, 4):
        rows23.append(f[:, i, :23] ^ pr[:, k:k + 23][:, ::-1])
        k += 23
    rows45 = []
    for i in range(4, 6):
        rows45.append(f[:, i, :15] ^ pr[:, k:k + 15][:, ::-1])
        k += 15

    # The 3 data Golay blocks and 2 Hamming blocks batch into one decode
    # each (see decode_imbe7200_frame).
    g_in = jnp.stack([row1[:, 1:24]] + rows23, axis=1)  # [C, 3, 23]
    h_in = jnp.stack(rows45, axis=1)                    # [C, 2, 15]
    # optimization_barrier works around an XLA TPU miscompile (jax 0.9.0,
    # v5e): stacking slices of one array with DIFFERENT minor-axis offsets
    # ([1:24] vs [:23]) emits rows shifted by one on TPU (CPU is correct).
    # Minimal repro + workaround matrix: tools/t_xla_stack_repro.py.
    g_rel = jnp.stack(list(jax.lax.optimization_barrier(
        (soft_rel[:, 1, 1:24], soft_rel[:, 2, :23], soft_rel[:, 3, :23]))),
        axis=1)
    g_out, g_errs = ecc.golay2312_soft(g_in, g_rel)
    h_out, h_errs = ecc.hamming1511_soft(h_in, soft_rel[:, 4:6, :15],
                                         variant7100=True)
    perrs = jnp.sum(g_errs, axis=1) + jnp.sum(h_errs, axis=1)
    c4_errs = h_errs[:, 0]

    dparts = [fr0[:, 18:11:-1]]  # C0 bits 18..12 (7 bits)
    for i in range(3):
        dparts.append(g_out[:, i, 22:10:-1])
    for i in range(2):
        dparts.append(h_out[:, i, 14:3:-1])
    dparts.append(f[:, 6, 22::-1])  # C6: 23 raw bits 22..0
    # soft path stays bit-plane channel-major; one transpose at the exit
    imbe_d = jnp.concatenate(dparts, axis=-1).T  # [88, C]
    imbe_d = convert_7100_to_7200(imbe_d)
    return imbe_d, c0_errs, perrs, c4_errs


# ---------------------------------------------------------------------------
# Process FSM (imbe7200x4400.c:780-925)
# ---------------------------------------------------------------------------

def process_imbe4400(imbe_d, total_errors, c0_errors, c0_valid, c4_errors,
                     c4_valid, cur: Parms, prev: Parms, enh: Parms,
                     comfort_rng, lcg_prime, words=None):
    """Batched mbe_processImbe4400Dataf (imbe7200x4400.c:858-888).

    Args:
      imbe_d: [88, C] int32 (channel-minor).
      total_errors/c0_errors/c4_errors: [C] i32; c0_valid/c4_valid [C] bool.
      words: optional field-forward packed imbe_d (see pack_imbe_words) —
        threads straight into decode_imbe4400_parms on the fused hard path.
    Returns: (audio [160, C] f32, cur', prev', enh', comfort_rng',
              flags dict of [C] bool: repeat, mute)
    """
    # -- prepare (imbe7200x4400.c:780-808) ---------------------------------
    c0e = jnp.where(c0_valid, c0_errors, 0)
    cur = dataclasses.replace(
        cur,
        errorCount4=jnp.where(c4_valid, c4_errors, 0),
        mutingThreshold=jnp.full_like(cur.mutingThreshold,
                                      MUTING_THRESHOLD_IMBE),
        errorCountTotal=total_errors,
        errorRate=(jnp.float32(0.95) * prev.errorRate
                   + jnp.float32(0.000365) * total_errors.astype(jnp.float32)))

    # -- decode (mutates cur model fields + prev prediction state) ---------
    cur, prev, bad = decode_imbe4400_parms(imbe_d, cur, prev, words=words)

    # -- repeat decision (imbe7200x4400.c:810-840) --------------------------
    repeat_threshold = jnp.float32(10.0) + jnp.float32(40.0) * cur.errorRate
    rep = jnp.where(
        bad == 1, True,
        jnp.where(c0_valid,
                  (c0e >= 2) & (total_errors.astype(jnp.float32)
                                >= repeat_threshold),
                  total_errors > 5))

    headroom = rep & (prev.repeatCount > 3)
    use_last = rep & ~headroom
    cur_reset = imbe_headroom_reset(cur)
    cur_rep = dataclasses.replace(
        prev, repeatCount=prev.repeatCount + 1)  # useLast + repeatCount++
    cur = select_cases([(headroom, cur_reset), (use_last, cur_rep)], cur)
    cur = dataclasses.replace(
        cur, repeatCount=jnp.where(rep, cur.repeatCount, 0))

    # -- synthesis (imbe7200x4400.c:842-856): always runs -------------------
    muted = (cur.repeatCount >= 4) | (cur.errorRate > cur.mutingThreshold)
    prev = cur  # prev <- cur (functional copy)
    Ml_e, rm0 = spectral_amp_enhance(cur.w0, cur.L, cur.Ml)
    cur = dataclasses.replace(cur, Ml=Ml_e)
    cn, new_rng = noise.comfort_noise(comfort_rng)
    audio, cur, enh, aux = synthesize_speech_core(cur, enh, cn, lcg_prime, rm0)
    comfort_rng = jnp.where(aux["mute"][None, :], new_rng, comfort_rng)
    lcg_prime = jnp.where(aux["cold_consumed"], jnp.float32(3147.0), lcg_prime)
    enh = cur  # prev_enh <- cur

    return (audio, cur, prev, enh, comfort_rng, lcg_prime,
            dict(repeat=rep, mute=muted))

