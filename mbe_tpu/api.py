"""1:1 mirror of the reference public API (include/mbelib-neo/mbelib.h).

Naming: `mbe_processImbe7200x4400Framef` -> `process_imbe7200x4400_framef`
etc. Every function operates on batched arrays ([C, ...]) and threads the
`ChannelState` functionally instead of mutating caller-owned structs; with
C == 1 these are drop-in equivalents of the single-stream reference calls.

Status semantics: functions that the reference guards with
MBE_STATUS_INVALID_ARGUMENT / MBE_STATUS_INVALID_BITS perform the same
validation on host inputs via `validate_*` helpers (ops/bits.py) and raise
`MbeInvalidBits` / `MbeInvalidArgument`, since a jitted kernel cannot return
an errno. The underlying kernels themselves are total functions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import pipeline
from .models import ambe, imbe, speech, state as state_mod
from .ops import bits as bit_ops
from .ops import ecc, noise
from .ops import synth as synth_ops
from .ops.enhance import adaptive_smoothing, spectral_amp_enhance  # noqa: F401
from .utils.config import DEFAULT as DEFAULT_CONFIG, DecoderConfig  # noqa: F401

# --- status / constants (mbelib.h:153-191, 679-686) ------------------------

PROCESS_FLAG_SOFT_INPUT = pipeline.FLAG_SOFT_INPUT
PROCESS_FLAG_C0_VALID = pipeline.FLAG_C0_VALID
PROCESS_FLAG_C4_VALID = pipeline.FLAG_C4_VALID
PROCESS_FLAG_TONE = pipeline.FLAG_TONE
PROCESS_FLAG_ERASURE = pipeline.FLAG_ERASURE
PROCESS_FLAG_REPEAT = pipeline.FLAG_REPEAT
PROCESS_FLAG_MUTE = pipeline.FLAG_MUTE

STATUS_INVALID_ARGUMENT = -1
STATUS_INVALID_BITS = -2

MAX_FRAME_REPEATS = state_mod.MAX_FRAME_REPEATS
MUTING_THRESHOLD_IMBE = float(state_mod.MUTING_THRESHOLD_IMBE)
MUTING_THRESHOLD_AMBE = float(state_mod.MUTING_THRESHOLD_AMBE)


class MbeInvalidBits(ValueError):
    """Input bits contained values other than 0/1 (MBE_STATUS_INVALID_BITS)."""


class MbeInvalidArgument(ValueError):
    """Invalid argument (MBE_STATUS_INVALID_ARGUMENT)."""


def _check_bits(arr):
    if bit_ops.validate_bits_host(np.asarray(arr)) != 0:
        raise MbeInvalidBits("bits must be 0 or 1")


# --- result helpers (mbelib.c:61-104) ---------------------------------------

def init_process_result():
    z = np.int32(0)
    return dict(c0_errors=z, protected_errors=z, c4_errors=z,
                total_errors=z, flags=np.int32(0))


def format_process_result(result, size=256) -> str:
    """mbe_formatProcessResult (mbelib.c:69-104): '='*total then E,T,R,M."""
    total = max(int(result["total_errors"]), 0)
    flags = int(result["flags"])
    out = []
    for _ in range(total):
        if len(out) + 1 >= size:
            break
        out.append("=")
    for flag, ch in ((PROCESS_FLAG_ERASURE, "E"), (PROCESS_FLAG_TONE, "T"),
                     (PROCESS_FLAG_REPEAT, "R"), (PROCESS_FLAG_MUTE, "M")):
        if flags & flag and len(out) + 1 < size:
            out.append(ch)
    return "".join(out)


# --- soft-bit helpers (mbelib.c:117-158) ------------------------------------

soft_bit_from_llr = bit_ops.soft_bit_from_llr
soft_bits_from_hard = bit_ops.soft_bits_from_hard


def soft_bit_from_hard(bit, reliability=255):
    b = jnp.asarray(bit, jnp.int32)
    return (b != 0).astype(jnp.int32), jnp.broadcast_to(
        jnp.asarray(reliability, jnp.int32), b.shape)


def soft_bits_from_llr(llr):
    return bit_ops.soft_bit_from_llr(llr)


# --- ECC (ecc.c) -------------------------------------------------------------

check_golay_block = ecc.check_golay_block
golay2312 = ecc.golay2312_hard
golay2312_soft = ecc.golay2312_soft


def hamming1511(bits):
    return ecc.hamming1511_hard(bits, variant7100=False)


def hamming1511_soft(bits, rel):
    return ecc.hamming1511_soft(bits, rel, variant7100=False)


def hamming1511_7100x4400(bits):
    return ecc.hamming1511_hard(bits, variant7100=True)


def hamming1511_7100x4400_soft(bits, rel):
    return ecc.hamming1511_soft(bits, rel, variant7100=True)


# --- core state management (mbelib.c:338-410) --------------------------------

def init_mbe_parms(channels=1, rng_seed=None) -> state_mod.ChannelState:
    """mbe_initMbeParms + mbe_setThreadRngSeed, batched."""
    return state_mod.init_state(channels, rng_seed)


def set_rng_seed(st: state_mod.ChannelState, seed) -> state_mod.ChannelState:
    """mbe_setThreadRngSeed (mbelib.c:173-181): reseeds the comfort-noise
    RNG and arms the unvoiced LCG cold-start override, per channel."""
    c = st.lcg_prime.shape[0]
    seed = jnp.broadcast_to(jnp.asarray(seed, jnp.uint32), (c,))
    seed = jnp.where(seed == 0, jnp.uint32(0x6D25357B), seed)
    return dataclasses.replace(
        st,
        comfort_rng=noise.java_random_init(seed),
        lcg_prime=(seed % jnp.uint32(noise.LCG_M)).astype(jnp.float32))


def move_mbe_parms(src: state_mod.Parms) -> state_mod.Parms:
    """mbe_moveMbeParms — functional copy (free in JAX)."""
    return src


use_last_mbe_parms = move_mbe_parms


# --- synthesis (mbelib.c:641-1132, mbe_adaptive.c:117-149) -------------------

def synthesize_silencef(channels):
    return jnp.zeros((channels, 160), jnp.float32)


def synthesize_silence(channels):
    return jnp.zeros((channels, 160), jnp.int16)


def synthesize_comfort_noisef(st: state_mod.ChannelState):
    """mbe_synthesizeComfortNoisef — returns (samples [C,160], state')."""
    samples, rng = noise.comfort_noise(st.comfort_rng)
    return samples.T, dataclasses.replace(st, comfort_rng=rng)


def synthesize_comfort_noise(st: state_mod.ChannelState):
    samples, st = synthesize_comfort_noisef(st)
    return synth_ops.float_to_short(samples), st


def synthesize_speechf(st: state_mod.ChannelState):
    """mbe_synthesizeSpeechf over (cur, prev): returns (audio, state')."""
    rm0 = speech.current_frame_rm0(st.cur)
    cn, new_rng = noise.comfort_noise(st.comfort_rng)
    audio, cur, prev, aux = speech.synthesize_speech_core(
        st.cur, st.prev, cn, st.lcg_prime, rm0)
    rng = jnp.where(aux["mute"][None, :], new_rng, st.comfort_rng)
    lcgp = jnp.where(aux["cold_consumed"], jnp.float32(3147.0), st.lcg_prime)
    return audio.T, dataclasses.replace(st, cur=cur, prev=prev,
                                        comfort_rng=rng, lcg_prime=lcgp)


def synthesize_speech(st: state_mod.ChannelState):
    audio, st = synthesize_speechf(st)
    return synth_ops.float_to_short(audio), st


def synthesize_tonef(ambe_d, st: state_mod.ChannelState):
    """mbe_synthesizeTonef (mbelib.c:745-804): returns (audio, state').
    ambe_d follows the public [C, 49] contract."""
    ad, id1 = synth_ops.parse_tone_fields(jnp.asarray(ambe_d, jnp.int32).T)
    audio, swn, tp = synth_ops.render_tone(id1, ad, st.cur.swn,
                                           st.cur.tonePhase)
    cur = dataclasses.replace(st.cur, swn=swn, tonePhase=tp)
    return audio.T, dataclasses.replace(st, cur=cur)


def synthesize_tonef_dstar(st: state_mod.ChannelState, id1):
    """mbe_synthesizeTonefdstar (mbelib.c:813-856): AD=103, single tones."""
    id1 = jnp.asarray(id1, jnp.int32)
    valid = (id1 == 5) | (id1 == 6) | ((id1 >= 7) & (id1 <= 122))
    tid = jnp.where(valid, id1, 0)
    audio, swn, tp = synth_ops.render_tone(
        tid, jnp.full_like(id1, 103), st.cur.swn, st.cur.tonePhase)
    cur = dataclasses.replace(st.cur, swn=swn, tonePhase=tp)
    return audio.T, dataclasses.replace(st, cur=cur)


float_to_short = synth_ops.float_to_short


def requires_muting(p: state_mod.Parms):
    """mbe_requiresMuting (mbe_adaptive.c:87-93)."""
    return p.errorRate > p.mutingThreshold


def is_max_frame_repeat(p: state_mod.Parms):
    """mbe_isMaxFrameRepeat (mbe_adaptive.c:101-107)."""
    return p.repeatCount >= MAX_FRAME_REPEATS


def requires_adaptive_smoothing(p: state_mod.Parms):
    """mbe_requiresAdaptiveSmoothing (mbe_adaptive.c:70-76)."""
    return (p.errorRate > 0.0125) | (p.errorCountTotal > 4)


def apply_adaptive_smoothing(cur: state_mod.Parms, prev: state_mod.Parms):
    """mbe_applyAdaptiveSmoothing (mbe_adaptive.c:268-276)."""
    rm0 = speech.current_frame_rm0(cur)
    Ml, Vl, le, at = adaptive_smoothing(
        cur.Ml, cur.Vl, cur.L, cur.errorRate, cur.errorCountTotal,
        cur.errorCount4, prev.localEnergy, prev.amplitudeThreshold, rm0)
    return dataclasses.replace(cur, Ml=Ml, Vl=Vl, localEnergy=le,
                               amplitudeThreshold=at)


def spectral_amp_enhance_parms(cur: state_mod.Parms):
    """mbe_spectralAmpEnhance[WithRm0] (mbelib.c:641-666)."""
    Ml, rm0 = spectral_amp_enhance(cur.w0, cur.L, cur.Ml)
    return dataclasses.replace(cur, Ml=Ml), rm0


# --- per-codec stage functions ----------------------------------------------
# These mirror the reference's staged mbe_ecc*/mbe_demodulate*/mbe_decode*
# intermediate CONTRACTS: callers see the same bit-plane frame mutations the
# C produces between stages, so they deliberately operate on [C, rows, cols]
# bit planes rather than delegating to the packed-word kernels the fused
# pipeline uses (models/*.decode_*_frame). The two formulations are kept
# equivalent by tests/test_stages.py (staged chain == fused frame decode on
# every codec, hard + soft); shared rules with subtle semantics live in one
# place (e.g. ambe.golay24_parity_fix).

def ecc_ambe3600x2450_c0(frame, soft_rel=None):
    """mbe_eccAmbe3600x2450C0 — returns (frame', c0_errors)."""
    return _ambe_c0(frame, soft_rel)


def ecc_ambe3600x2400_c0(frame, soft_rel=None):
    return _ambe_c0(frame, soft_rel)


def _ambe_c0(frame, soft_rel):
    f = jnp.asarray(frame, jnp.int32)
    if soft_rel is not None:
        g_out, errs = ecc.golay2312_soft(f[:, 0, 1:24], soft_rel[:, 0, 1:24])
    else:
        g_out, errs = ecc.golay2312_hard(f[:, 0, 1:24])
    bit0, errs = ambe.golay24_parity_fix(f[:, 0, 0],
                                         jnp.sum(g_out, axis=-1), errs)
    fr0 = jnp.concatenate([bit0[:, None], g_out], axis=-1)
    out = f.at[:, 0, :].set(fr0)
    return out, errs


def decode_ambe3600x2450_frame(frame, soft_rel=None):
    """mbe_decodeAmbe3600x2450[Soft]Frame: (ambe_d, result dict)."""
    d, c0, prot = ambe.decode_ambe3600_frame(jnp.asarray(frame, jnp.int32),
                                             soft_rel)
    return d.T, _mk_result(c0, prot, None, soft_rel is not None,
                           c4_valid=False)


decode_ambe3600x2400_frame = decode_ambe3600x2450_frame  # same common stage


def decode_imbe7200x4400_frame(frame, soft_rel=None):
    d, c0, prot, c4 = imbe.decode_imbe7200_frame(
        jnp.asarray(frame, jnp.int32), soft_rel)
    return d.T, _mk_result(c0, prot, c4, soft_rel is not None, c4_valid=True)


def decode_imbe7100x4400_frame(frame, soft_rel=None):
    d, c0, prot, c4 = imbe.decode_imbe7100_frame(
        jnp.asarray(frame, jnp.int32), soft_rel)
    return d.T, _mk_result(c0, prot, c4, soft_rel is not None, c4_valid=True)


def convert_imbe7100to7200(imbe_d):
    """mbe_convertImbe7100to7200 over the public [C, 88] layout."""
    return imbe.convert_7100_to_7200(jnp.asarray(imbe_d, jnp.int32).T).T


def decode_imbe4400_parms(imbe_d, st: state_mod.ChannelState):
    """mbe_decodeImbe4400Parms: returns (state', bad [C])."""
    cur, prev, bad = imbe.decode_imbe4400_parms(
        jnp.asarray(imbe_d, jnp.int32).T, st.cur, st.prev)
    return dataclasses.replace(st, cur=cur, prev=prev), bad


def decode_ambe2450_parms(ambe_d, st: state_mod.ChannelState,
                          total_errors=None):
    c = st.lcg_prime.shape[0]
    te = (jnp.full((c,), -1, jnp.int32) if total_errors is None
          else jnp.asarray(total_errors, jnp.int32))
    cur, prev, bad = ambe.decode_ambe2450_parms(
        jnp.asarray(ambe_d, jnp.int32).T, st.cur, st.prev, te)
    return dataclasses.replace(st, cur=cur, prev=prev), bad


def decode_ambe2400_parms(ambe_d, st: state_mod.ChannelState):
    cur, prev, bad = ambe.decode_ambe2400_parms(
        jnp.asarray(ambe_d, jnp.int32).T, st.cur, st.prev)
    return dataclasses.replace(st, cur=cur, prev=prev), bad


def _mk_result(c0, prot, c4, soft, c4_valid):
    flags = pipeline.FLAG_C0_VALID
    if soft:
        flags |= pipeline.FLAG_SOFT_INPUT
    if c4_valid:
        flags |= pipeline.FLAG_C4_VALID
    z = jnp.zeros_like(c0)
    return dict(c0_errors=c0, protected_errors=prot,
                c4_errors=c4 if c4 is not None else z,
                total_errors=c0 + prot,
                flags=jnp.full_like(c0, flags))


# --- full process wrappers ---------------------------------------------------

def _process(codec, frame, st, soft_rel, int16, config=DEFAULT_CONFIG):
    # host-side strict 0/1 validation, mirroring MBE_STATUS_INVALID_BITS
    # (mbe_result.h:18-42); skipped for traced inputs (validated upstream)
    if isinstance(frame, np.ndarray):
        _check_bits(frame)
    if isinstance(soft_rel, np.ndarray):
        if isinstance(frame, np.ndarray) and \
                bit_ops.validate_soft_bits_host(frame) != 0:
            raise MbeInvalidBits("soft bits must be 0 or 1")
        # mbe_soft_bit.reliability is uint8 by type (mbelib.h:148-151);
        # reject values this API's int32 arrays could smuggle past that.
        if ((soft_rel < 0) | (soft_rel > 255)).any():
            raise MbeInvalidArgument("soft reliability out of range [0,255]")
    frame = jnp.asarray(frame, jnp.int32)
    if int16 or config.int16_output:
        return pipeline.step_int16(codec, frame, st, soft_rel, config)
    return pipeline.step(codec, frame, st, soft_rel, config)


def process_imbe7200x4400_framef(frame, st, soft_rel=None,
                                 config=DEFAULT_CONFIG):
    return _process("imbe7200", frame, st, soft_rel, False, config)


def process_imbe7200x4400_frame(frame, st, soft_rel=None,
                                config=DEFAULT_CONFIG):
    return _process("imbe7200", frame, st, soft_rel, True, config)


def process_imbe7100x4400_framef(frame, st, soft_rel=None,
                                 config=DEFAULT_CONFIG):
    return _process("imbe7100", frame, st, soft_rel, False, config)


def process_imbe7100x4400_frame(frame, st, soft_rel=None,
                                config=DEFAULT_CONFIG):
    return _process("imbe7100", frame, st, soft_rel, True, config)


def process_ambe3600x2450_framef(frame, st, soft_rel=None,
                                 config=DEFAULT_CONFIG):
    return _process("ambe2450", frame, st, soft_rel, False, config)


def process_ambe3600x2450_frame(frame, st, soft_rel=None,
                                config=DEFAULT_CONFIG):
    return _process("ambe2450", frame, st, soft_rel, True, config)


def process_ambe3600x2400_framef(frame, st, soft_rel=None,
                                 config=DEFAULT_CONFIG):
    return _process("ambe2400", frame, st, soft_rel, False, config)


def process_ambe3600x2400_frame(frame, st, soft_rel=None,
                                config=DEFAULT_CONFIG):
    return _process("ambe2400", frame, st, soft_rel, True, config)


def _process_data(process_fn, d, total_errors, c0_errors, c0_valid,
                  c4_errors, c4_valid, st, imbe_path,
                  config=DEFAULT_CONFIG):
    te = jnp.asarray(total_errors, jnp.int32)
    c0 = jnp.asarray(c0_errors, jnp.int32)
    c0v = jnp.asarray(c0_valid, bool)
    # per-lane MBE_STATUS_INVALID_BITS for traced inputs (host inputs were
    # rejected by the wrapper): invalid lanes emit silence with state
    # rolled back, and the kernels run on {0,1}-masked bits so they stay
    # total. Mirrors ambe2450_prepare_process's mbe_validate_bits.
    d = jnp.asarray(d, jnp.int32)
    lanes_valid = bit_ops.bits_valid(d)
    d = (d & 1).T  # channel-minor for the internal process paths
    enh_in = st.enh if st.enh is not None else st.cur
    if imbe_path:
        c4 = jnp.asarray(c4_errors, jnp.int32)
        c4v = jnp.asarray(c4_valid, bool)
        out = process_fn(d, te, c0, c0v, c4, c4v,
                         st.cur, st.prev, enh_in, st.comfort_rng,
                         st.lcg_prime)
    else:
        if st.enh is None:
            raise ValueError("AMBE paths require a carried enh state; "
                             "use init_state(carry_enh=True)")
        out = process_fn(d, te, c0, c0v,
                         st.cur, st.prev, enh_in, st.comfort_rng,
                         st.lcg_prime, tones_enabled=config.tones_enabled)
    audio, cur, prev, enh, rng, lcgp, fsm = out
    if st.enh is None and imbe_path:
        enh = None  # enh == cur; keep the carry structure slim
    new_st = state_mod.ChannelState(cur=cur, prev=prev, enh=enh,
                                    comfort_rng=rng, lcg_prime=lcgp)

    def lane_sel(new, old):
        v = lanes_valid.reshape((1,) * (new.ndim - 1) + (-1,))
        return jnp.where(v, new, old)

    new_st = jax.tree.map(lane_sel, new_st, st)
    audio = jnp.where(lanes_valid[None, :], audio, 0.0).T
    fsm = {k: jnp.where(lanes_valid, v, jnp.zeros_like(v))
           for k, v in fsm.items()}
    fsm["status"] = jnp.where(lanes_valid, 0, STATUS_INVALID_BITS
                              ).astype(jnp.int32)
    return audio, new_st, fsm


def _resolve_data_entry(total_errors, c0_errors, c4_errors):
    """On-entry result resolution for the Data paths (mbe_result.h:76-114).

    The reference validates/resolves the caller-supplied result before
    processing and refuses inconsistent totals
    (mbe_result_resolve_total_errors called from every mbe_process*Dataf).
    Host (int/numpy) inputs get the same treatment here: range checks,
    total==0-with-nonzero-components resolution, and total>=component
    consistency. Traced inputs pass through unchanged (a jitted kernel
    cannot raise), same as frame-bit validation in _process.

    Returns the (possibly resolved) total_errors to use.
    """
    if not isinstance(total_errors, (int, np.integer, np.ndarray, list)):
        return total_errors  # traced — validated upstream by the caller
    te = np.atleast_1d(np.asarray(total_errors, np.int64))
    c0 = (np.zeros_like(te) if c0_errors is None
          else np.atleast_1d(np.asarray(c0_errors, np.int64)))
    c4 = (np.zeros_like(te) if c4_errors is None
          else np.atleast_1d(np.asarray(c4_errors, np.int64)))
    for name, arr in (("total", te), ("c0", c0), ("c4", c4)):
        if ((arr < 0) | (arr > 184)).any():
            raise MbeInvalidArgument(f"{name}_errors out of range [0,184]")
    # mbe_result.h:92-95: zero total with nonzero components resolves to the
    # component sum. Component = c0 + protected; this entry point only knows
    # c0 (c4 is a *subset* of protected, never added to the component sum).
    component = c0
    resolved = np.where((te == 0) & (component != 0), component, te)
    if ((resolved < c0) | (resolved < c4)).any():
        raise MbeInvalidArgument(
            "inconsistent totals: total_errors < component errors")
    return np.asarray(resolved, np.int32).reshape(np.shape(total_errors))


def process_imbe4400_dataf(imbe_d, st, total_errors, c0_errors=None,
                           c4_errors=None, config=DEFAULT_CONFIG):
    """mbe_processImbe4400Dataf. c0/c4_errors None = context not available
    (the Dataf fallback repeat rules, imbe7200x4400.c:815-822)."""
    if isinstance(imbe_d, np.ndarray):
        _check_bits(imbe_d)  # mbe_validate_bits(imbe_d, 88) on entry
    total_errors = _resolve_data_entry(total_errors, c0_errors, c4_errors)
    c = st.lcg_prime.shape[0]
    z = jnp.zeros((c,), jnp.int32)
    c0v = jnp.full((c,), c0_errors is not None)
    c4v = jnp.full((c,), c4_errors is not None)
    return _process_data(imbe.process_imbe4400, imbe_d, total_errors,
                         z if c0_errors is None else c0_errors, c0v,
                         z if c4_errors is None else c4_errors, c4v,
                         st, imbe_path=True, config=config)


def process_ambe2450_dataf(ambe_d, st, total_errors, c0_errors=None,
                           config=DEFAULT_CONFIG):
    if isinstance(ambe_d, np.ndarray):
        _check_bits(ambe_d)  # mbe_validate_bits(ambe_d, 49) on entry
    total_errors = _resolve_data_entry(total_errors, c0_errors, None)
    c = st.lcg_prime.shape[0]
    z = jnp.zeros((c,), jnp.int32)
    c0v = jnp.full((c,), c0_errors is not None)
    return _process_data(ambe.process_ambe2450, ambe_d, total_errors,
                         z if c0_errors is None else c0_errors, c0v,
                         None, None, st, imbe_path=False, config=config)


def process_ambe2400_dataf(ambe_d, st, total_errors, c0_errors=None,
                           config=DEFAULT_CONFIG):
    if isinstance(ambe_d, np.ndarray):
        _check_bits(ambe_d)  # mbe_validate_bits(ambe_d, 49) on entry
    total_errors = _resolve_data_entry(total_errors, c0_errors, None)
    c = st.lcg_prime.shape[0]
    z = jnp.zeros((c,), jnp.int32)
    c0v = jnp.full((c,), c0_errors is not None)
    return _process_data(ambe.process_ambe2400, ambe_d, total_errors,
                         z if c0_errors is None else c0_errors, c0v,
                         None, None, st, imbe_path=False, config=config)


# --- debug dumps (host-side, mirror mbe_dump* stderr printers) ---------------

def _dump_bits(arr, order) -> str:
    return "".join(str(int(b)) for b in np.asarray(arr).ravel()[order])


def dump_ambe2450_data(ambe_d) -> str:
    """mbe_dumpAmbe2450Data (ambe3600x2450.c:95-107): 49 bits in order."""
    d = np.asarray(ambe_d).reshape(-1)
    return "".join(str(int(b)) for b in d[:49])


dump_ambe2400_data = dump_ambe2450_data


def dump_ambe3600_frame(frame) -> str:
    """mbe_dumpAmbe3600x24xxFrame: c0 bits 23..0, c1 22..0, c2 10..0,
    c3 13..0 (ambe3600x2450.c:113-142)."""
    f = np.asarray(frame).reshape(4, 24)
    parts = [
        "".join(str(int(b)) for b in f[0, 23::-1]),
        "".join(str(int(b)) for b in f[1, 22::-1]),
        "".join(str(int(b)) for b in f[2, 10::-1]),
        "".join(str(int(b)) for b in f[3, 13::-1]),
    ]
    return " ".join(parts)


dump_ambe3600x2450_frame = dump_ambe3600_frame
dump_ambe3600x2400_frame = dump_ambe3600_frame


def dump_imbe4400_data(imbe_d) -> str:
    """mbe_dumpImbe4400Data (imbe7200x4400.c:360-371)."""
    d = np.asarray(imbe_d).reshape(-1)
    return "".join(str(int(b)) for b in d[:88])


def dump_imbe7200x4400_data(imbe_d) -> str:
    """mbe_dumpImbe7200x4400Data: 88 bits with field separators
    (imbe7200x4400.c:377-391)."""
    d = np.asarray(imbe_d).reshape(-1)
    out = []
    for i in range(88):
        if i in (12, 24, 36, 48, 59, 70, 81):
            out.append(" ")
        out.append(str(int(d[i])))
    return "".join(out)


def dump_imbe7100x4400_data(imbe_d) -> str:
    """mbe_dumpImbe7100x4400Data (imbe7100x4400.c:30-44)."""
    d = np.asarray(imbe_d).reshape(-1)
    out = []
    for i in range(88):
        if i in (7, 19, 31, 43, 54, 65):
            out.append(" ")
        out.append(str(int(d[i])))
    return "".join(out)


def dump_imbe7200x4400_frame(frame) -> str:
    """mbe_dumpImbe7200x4400Frame (imbe7200x4400.c:397-417)."""
    f = np.asarray(frame).reshape(8, 23)
    parts = ["".join(str(int(b)) for b in f[i, 22::-1]) for i in range(4)]
    parts += ["".join(str(int(b)) for b in f[i, 14::-1]) for i in range(4, 7)]
    parts += ["".join(str(int(b)) for b in f[7, 6::-1])]
    return " ".join(parts)


def dump_imbe7100x4400_frame(frame) -> str:
    """mbe_dumpImbe7100x4400Frame (imbe7100x4400.c:50-92)."""
    f = np.asarray(frame).reshape(7, 24)

    def seg(row, hi, lo, gap):
        s = ""
        for j in range(hi, lo - 1, -1):
            if j == gap:
                s += " "
            s += str(int(f[row, j]))
        return s

    parts = [seg(0, 18, 0, 11), seg(1, 23, 0, 11), seg(2, 22, 0, 10),
             seg(3, 22, 0, 10), seg(4, 14, 0, 3), seg(5, 14, 0, 3),
             "".join(str(int(b)) for b in f[6, 22::-1])]
    return " ".join(parts)


# --- standalone per-stage functions (ecc*/demodulate* API mirrors) ----------

def _ambe_demod(frame):
    """mbe_demodulateAmbe3600x24xxData (ambe_common.c:75-100): XOR C1 with
    the keystream seeded from C0 bits 23..12. Returns frame'."""
    f = jnp.asarray(frame, jnp.int32)
    seed = 16 * bit_ops.pack_descending(f[:, 0, :], 23, 12)
    from .ops import demod as demod_ops
    pr = demod_ops.prng_bits(seed, 23).T
    fr1 = f[:, 1, :23] ^ pr[:, ::-1]
    return f.at[:, 1, :23].set(fr1)


demodulate_ambe3600x2450_data = _ambe_demod
demodulate_ambe3600x2400_data = _ambe_demod


def _ambe_ecc_data(frame, soft_rel=None):
    """mbe_eccAmbe3600x24xxData (ambe_common.c:127-189): Golay C1 + 49-bit
    packing. Returns (ambe_d [C,49], protected_errors [C])."""
    f = jnp.asarray(frame, jnp.int32)
    if soft_rel is not None:
        g1, errs = ecc.golay2312_soft(f[:, 1, :23], soft_rel[:, 1, :23])
    else:
        g1, errs = ecc.golay2312_hard(f[:, 1, :23])
    ambe_d = jnp.concatenate([
        f[:, 0, 23:11:-1], g1[:, 22:10:-1], f[:, 2, 10::-1], f[:, 3, 13::-1],
    ], axis=-1)
    return ambe_d, errs


ecc_ambe3600x2450_data = _ambe_ecc_data
ecc_ambe3600x2400_data = _ambe_ecc_data


def ecc_imbe7200x4400_c0(frame, soft_rel=None):
    """mbe_eccImbe7200x4400C0 (imbe7200x4400.c:424-460): Golay on row 0.
    Returns (frame', c0_errors)."""
    f = jnp.asarray(frame, jnp.int32)
    if soft_rel is not None:
        out, errs = ecc.golay2312_soft(f[:, 0, :], soft_rel[:, 0, :])
    else:
        out, errs = ecc.golay2312_hard(f[:, 0, :])
    return f.at[:, 0, :].set(out), errs


def demodulate_imbe7200x4400_data(frame):
    """mbe_demodulateImbe7200x4400Data (imbe7200x4400.c:636-673)."""
    from .ops import demod as demod_ops
    f = jnp.asarray(frame, jnp.int32)
    seed = 16 * bit_ops.pack_descending(f[:, 0, :], 22, 11)
    pr = demod_ops.prng_bits(seed, 114).T
    k = 0
    for i in range(1, 4):
        f = f.at[:, i, :].set(f[:, i, :] ^ pr[:, k:k + 23][:, ::-1])
        k += 23
    for i in range(4, 7):
        f = f.at[:, i, :15].set(f[:, i, :15] ^ pr[:, k:k + 15][:, ::-1])
        k += 15
    return f


def ecc_imbe7200x4400_data(frame, soft_rel=None):
    """mbe_eccImbe7200x4400Data (imbe7200x4400.c:469-580): data-field ECC +
    88-bit packing. Returns (imbe_d [C,88], protected_errors, c4_errors)."""
    f = jnp.asarray(frame, jnp.int32)
    dparts = [f[:, 0, 22:10:-1]]
    perrs = 0
    c4 = None
    for i in range(1, 4):
        if soft_rel is not None:
            out, errs = ecc.golay2312_soft(f[:, i, :], soft_rel[:, i, :])
        else:
            out, errs = ecc.golay2312_hard(f[:, i, :])
        perrs = perrs + errs
        dparts.append(out[:, 22:10:-1])
    for i in range(4, 7):
        if soft_rel is not None:
            out, errs = ecc.hamming1511_soft(f[:, i, :15], soft_rel[:, i, :15])
        else:
            out, errs = ecc.hamming1511_hard(f[:, i, :15])
        perrs = perrs + errs
        if i == 4:
            c4 = errs
        dparts.append(out[:, 14:3:-1])
    dparts.append(f[:, 7, 6::-1])
    return jnp.concatenate(dparts, axis=-1), perrs, c4


def ecc_imbe7100x4400_c0(frame, soft_rel=None):
    """mbe_eccImbe7100x4400C0 (imbe7100x4400.c:99-143): short Golay over 18
    data bits at fr[0][1..18] (padded). Returns (frame', c0_errors)."""
    f = jnp.asarray(frame, jnp.int32)
    c = f.shape[0]
    zeros5 = jnp.zeros((c, 5), jnp.int32)
    g_in = jnp.concatenate([f[:, 0, 1:19], zeros5], axis=-1)
    if soft_rel is not None:
        rel = jnp.concatenate([soft_rel[:, 0, 1:19],
                               jnp.full((c, 5), 255, jnp.int32)], axis=-1)
        out, errs = ecc.golay2312_soft(g_in, rel)
    else:
        out, errs = ecc.golay2312_hard(g_in)
    return f.at[:, 0, 1:19].set(out[:, :18]), errs


def demodulate_imbe7100x4400_data(frame):
    """mbe_demodulateImbe7100x4400Data (imbe7100x4400.c:291-334)."""
    from .ops import demod as demod_ops
    f = jnp.asarray(frame, jnp.int32)
    seed = 16 * bit_ops.pack_descending(f[:, 0, :], 18, 12)
    pr = demod_ops.prng_bits(seed, 100).T
    f = f.at[:, 1, :].set(f[:, 1, :] ^ pr[:, 0:24][:, ::-1])
    k = 24
    for i in range(2, 4):
        f = f.at[:, i, :23].set(f[:, i, :23] ^ pr[:, k:k + 23][:, ::-1])
        k += 23
    for i in range(4, 6):
        f = f.at[:, i, :15].set(f[:, i, :15] ^ pr[:, k:k + 15][:, ::-1])
        k += 15
    return f


def ecc_imbe7100x4400_data(frame, soft_rel=None):
    """mbe_eccImbe7100x4400Data (imbe7100x4400.c:152-285): data ECC +
    88-bit packing (7100 layout). Returns (imbe_d, protected, c4)."""
    f = jnp.asarray(frame, jnp.int32)
    dparts = [f[:, 0, 18:11:-1]]
    if soft_rel is not None:
        out, perrs = ecc.golay2312_soft(f[:, 1, 1:24], soft_rel[:, 1, 1:24])
    else:
        out, perrs = ecc.golay2312_hard(f[:, 1, 1:24])
    dparts.append(out[:, 22:10:-1])
    c4 = None
    for i in range(2, 4):
        if soft_rel is not None:
            out, errs = ecc.golay2312_soft(f[:, i, :23], soft_rel[:, i, :23])
        else:
            out, errs = ecc.golay2312_hard(f[:, i, :23])
        perrs = perrs + errs
        dparts.append(out[:, 22:10:-1])
    for i in range(4, 6):
        if soft_rel is not None:
            out, errs = ecc.hamming1511_soft(f[:, i, :15],
                                             soft_rel[:, i, :15],
                                             variant7100=True)
        else:
            out, errs = ecc.hamming1511_hard(f[:, i, :15], variant7100=True)
        perrs = perrs + errs
        if i == 4:
            c4 = errs
        dparts.append(out[:, 14:3:-1])
    dparts.append(f[:, 6, 22::-1])
    return jnp.concatenate(dparts, axis=-1), perrs, c4


def resolve_total_errors(result) -> int:
    """mbe_result_resolve_total_errors (mbe_result.h:76-99), host-side.

    Raises MbeInvalidArgument on inconsistent counters; returns the resolved
    total (0 if result is None)."""
    if result is None:
        return 0
    flags = int(result["flags"])
    known = (PROCESS_FLAG_SOFT_INPUT | PROCESS_FLAG_C0_VALID
             | PROCESS_FLAG_C4_VALID | PROCESS_FLAG_TONE
             | PROCESS_FLAG_ERASURE | PROCESS_FLAG_REPEAT | PROCESS_FLAG_MUTE)
    if flags & ~known:
        raise MbeInvalidArgument("unknown flags")
    c0 = int(result["c0_errors"])
    prot = int(result["protected_errors"])
    c4 = int(result["c4_errors"])
    total = int(result["total_errors"])
    for v in (c0, prot, c4, total):
        if not (0 <= v <= 184):
            raise MbeInvalidArgument("error count out of range")
    if c0 > 184 - prot:
        raise MbeInvalidArgument("component overflow")
    component = c0 + prot
    resolved = component if (total == 0 and component != 0) else total
    consistent = ((component == 0 or resolved == component)
                  and (not flags & PROCESS_FLAG_C0_VALID or resolved >= c0)
                  and (not flags & PROCESS_FLAG_C4_VALID or resolved >= c4))
    if not consistent:
        raise MbeInvalidArgument("inconsistent totals")
    return resolved


# --- explicit Soft/short variant names (1:1 with the reference header) -------

def _soft_f(codec):
    def fn(frame, soft_rel, st, config=DEFAULT_CONFIG):
        return _process(codec, frame, st, soft_rel, False, config)
    return fn


def _soft_s(codec):
    def fn(frame, soft_rel, st, config=DEFAULT_CONFIG):
        return _process(codec, frame, st, soft_rel, True, config)
    return fn


process_imbe7200x4400_soft_framef = _soft_f("imbe7200")
process_imbe7200x4400_soft_frame = _soft_s("imbe7200")
process_imbe7100x4400_soft_framef = _soft_f("imbe7100")
process_imbe7100x4400_soft_frame = _soft_s("imbe7100")
process_ambe3600x2450_soft_framef = _soft_f("ambe2450")
process_ambe3600x2450_soft_frame = _soft_s("ambe2450")
process_ambe3600x2400_soft_framef = _soft_f("ambe2400")
process_ambe3600x2400_soft_frame = _soft_s("ambe2400")


def decode_imbe7200x4400_soft_frame(frame, soft_rel):
    return decode_imbe7200x4400_frame(frame, soft_rel)


def decode_imbe7100x4400_soft_frame(frame, soft_rel):
    return decode_imbe7100x4400_frame(frame, soft_rel)


def decode_ambe3600x2450_soft_frame(frame, soft_rel):
    return decode_ambe3600x2450_frame(frame, soft_rel)


def decode_ambe3600x2400_soft_frame(frame, soft_rel):
    return decode_ambe3600x2400_frame(frame, soft_rel)


def _data_int16(fn):
    def wrapper(*args, **kw):
        audio, st2, fsm = fn(*args, **kw)
        return synth_ops.float_to_short(audio), st2, fsm
    return wrapper


process_imbe4400_data = _data_int16(process_imbe4400_dataf)
process_ambe2450_data = _data_int16(process_ambe2450_dataf)
process_ambe2400_data = _data_int16(process_ambe2400_dataf)


#: 1:1 map from every reference public symbol (include/mbelib-neo/mbelib.h)
#: to its counterpart here. Checked exhaustively by tests/test_api_surface.py.
REFERENCE_SYMBOL_MAP = {
    "mbe_versionString": "mbe_tpu.version_string",
    "mbe_initProcessResult": "init_process_result",
    "mbe_formatProcessResult": "format_process_result",
    "mbe_softBitFromHard": "soft_bit_from_hard",
    "mbe_softBitFromLlr": "soft_bit_from_llr",
    "mbe_softBitsFromHard": "soft_bits_from_hard",
    "mbe_softBitsFromLlr": "soft_bits_from_llr",
    "mbe_checkGolayBlock": "check_golay_block",
    "mbe_golay2312": "golay2312",
    "mbe_golay2312Soft": "golay2312_soft",
    "mbe_hamming1511": "hamming1511",
    "mbe_hamming1511Soft": "hamming1511_soft",
    "mbe_7100x4400hamming1511": "hamming1511_7100x4400",
    "mbe_7100x4400hamming1511Soft": "hamming1511_7100x4400_soft",
    "mbe_initMbeParms": "init_mbe_parms",
    "mbe_setThreadRngSeed": "set_rng_seed",
    "mbe_moveMbeParms": "move_mbe_parms",
    "mbe_useLastMbeParms": "use_last_mbe_parms",
    "mbe_spectralAmpEnhance": "spectral_amp_enhance_parms",
    "mbe_applyAdaptiveSmoothing": "apply_adaptive_smoothing",
    "mbe_requiresAdaptiveSmoothing": "requires_adaptive_smoothing",
    "mbe_requiresMuting": "requires_muting",
    "mbe_isMaxFrameRepeat": "is_max_frame_repeat",
    "mbe_synthesizeComfortNoisef": "synthesize_comfort_noisef",
    "mbe_synthesizeComfortNoise": "synthesize_comfort_noise",
    "mbe_synthesizeSilencef": "synthesize_silencef",
    "mbe_synthesizeSilence": "synthesize_silence",
    "mbe_synthesizeSpeechf": "synthesize_speechf",
    "mbe_synthesizeSpeech": "synthesize_speech",
    "mbe_synthesizeTonef": "synthesize_tonef",
    "mbe_synthesizeTonefdstar": "synthesize_tonef_dstar",
    "mbe_floattoshort": "float_to_short",
    "mbe_convertImbe7100to7200": "convert_imbe7100to7200",
    # per-codec stage functions
    "mbe_eccAmbe3600x2450C0": "ecc_ambe3600x2450_c0",
    "mbe_eccAmbe3600x2400C0": "ecc_ambe3600x2400_c0",
    "mbe_eccAmbe3600x2450Data": "ecc_ambe3600x2450_data",
    "mbe_eccAmbe3600x2400Data": "ecc_ambe3600x2400_data",
    "mbe_eccImbe7200x4400C0": "ecc_imbe7200x4400_c0",
    "mbe_eccImbe7200x4400Data": "ecc_imbe7200x4400_data",
    "mbe_eccImbe7100x4400C0": "ecc_imbe7100x4400_c0",
    "mbe_eccImbe7100x4400Data": "ecc_imbe7100x4400_data",
    "mbe_demodulateAmbe3600x2450Data": "demodulate_ambe3600x2450_data",
    "mbe_demodulateAmbe3600x2400Data": "demodulate_ambe3600x2400_data",
    "mbe_demodulateImbe7200x4400Data": "demodulate_imbe7200x4400_data",
    "mbe_demodulateImbe7100x4400Data": "demodulate_imbe7100x4400_data",
    "mbe_decodeAmbe2450Parms": "decode_ambe2450_parms",
    "mbe_decodeAmbe2400Parms": "decode_ambe2400_parms",
    "mbe_decodeImbe4400Parms": "decode_imbe4400_parms",
    "mbe_decodeAmbe3600x2450Frame": "decode_ambe3600x2450_frame",
    "mbe_decodeAmbe3600x2450SoftFrame": "decode_ambe3600x2450_soft_frame",
    "mbe_decodeAmbe3600x2400Frame": "decode_ambe3600x2400_frame",
    "mbe_decodeAmbe3600x2400SoftFrame": "decode_ambe3600x2400_soft_frame",
    "mbe_decodeImbe7200x4400Frame": "decode_imbe7200x4400_frame",
    "mbe_decodeImbe7200x4400SoftFrame": "decode_imbe7200x4400_soft_frame",
    "mbe_decodeImbe7100x4400Frame": "decode_imbe7100x4400_frame",
    "mbe_decodeImbe7100x4400SoftFrame": "decode_imbe7100x4400_soft_frame",
    "mbe_processAmbe2450Dataf": "process_ambe2450_dataf",
    "mbe_processAmbe2450Data": "process_ambe2450_data",
    "mbe_processAmbe2400Dataf": "process_ambe2400_dataf",
    "mbe_processAmbe2400Data": "process_ambe2400_data",
    "mbe_processImbe4400Dataf": "process_imbe4400_dataf",
    "mbe_processImbe4400Data": "process_imbe4400_data",
    "mbe_processAmbe3600x2450Framef": "process_ambe3600x2450_framef",
    "mbe_processAmbe3600x2450Frame": "process_ambe3600x2450_frame",
    "mbe_processAmbe3600x2450SoftFramef": "process_ambe3600x2450_soft_framef",
    "mbe_processAmbe3600x2450SoftFrame": "process_ambe3600x2450_soft_frame",
    "mbe_processAmbe3600x2400Framef": "process_ambe3600x2400_framef",
    "mbe_processAmbe3600x2400Frame": "process_ambe3600x2400_frame",
    "mbe_processAmbe3600x2400SoftFramef": "process_ambe3600x2400_soft_framef",
    "mbe_processAmbe3600x2400SoftFrame": "process_ambe3600x2400_soft_frame",
    "mbe_processImbe7200x4400Framef": "process_imbe7200x4400_framef",
    "mbe_processImbe7200x4400Frame": "process_imbe7200x4400_frame",
    "mbe_processImbe7200x4400SoftFramef": "process_imbe7200x4400_soft_framef",
    "mbe_processImbe7200x4400SoftFrame": "process_imbe7200x4400_soft_frame",
    "mbe_processImbe7100x4400Framef": "process_imbe7100x4400_framef",
    "mbe_processImbe7100x4400Frame": "process_imbe7100x4400_frame",
    "mbe_processImbe7100x4400SoftFramef": "process_imbe7100x4400_soft_framef",
    "mbe_processImbe7100x4400SoftFrame": "process_imbe7100x4400_soft_frame",
    "mbe_dumpAmbe2450Data": "dump_ambe2450_data",
    "mbe_dumpAmbe2400Data": "dump_ambe2400_data",
    "mbe_dumpAmbe3600x2450Frame": "dump_ambe3600x2450_frame",
    "mbe_dumpAmbe3600x2400Frame": "dump_ambe3600x2400_frame",
    "mbe_dumpImbe4400Data": "dump_imbe4400_data",
    "mbe_dumpImbe7200x4400Data": "dump_imbe7200x4400_data",
    "mbe_dumpImbe7100x4400Data": "dump_imbe7100x4400_data",
    "mbe_dumpImbe7200x4400Frame": "dump_imbe7200x4400_frame",
    "mbe_dumpImbe7100x4400Frame": "dump_imbe7100x4400_frame",
}
