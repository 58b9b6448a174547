"""Fused per-frame decode+synthesis steps and time-scan drivers.

These are the framework's main entry points: one jitted step per codec that
takes a batch of frames ([C, rows, cols] bitplanes) plus the channel state
and returns (state', pcm [C, 160], result). Throughput comes from the
channel axis; the strict frame-to-frame state dependency (phases, WOLA
overlap, LCG, error IIR — SURVEY.md §5) is carried by `lax.scan` in
`run_sequence`.
"""

import jax
import jax.numpy as jnp

from .models import ambe, imbe
from .models.state import ChannelState
from .ops import bits as bit_ops
from .ops import synth as synth_ops
from .utils.config import DEFAULT as DEFAULT_CONFIG, DecoderConfig

STATUS_OK = 0
STATUS_INVALID_BITS = -2

FLAG_SOFT_INPUT = 0x0001
FLAG_C0_VALID = 0x0002
FLAG_C4_VALID = 0x0004
FLAG_TONE = 0x0010
FLAG_ERASURE = 0x0020
FLAG_REPEAT = 0x0040
FLAG_MUTE = 0x0080

CODECS = ("imbe7200", "imbe7100", "ambe2450", "ambe2400")
FRAME_SHAPES = {
    "imbe7200": (8, 23),
    "imbe7100": (7, 24),
    "ambe2450": (4, 24),
    "ambe2400": (4, 24),
}
DBITS = {"imbe7200": 88, "imbe7100": 88, "ambe2450": 49, "ambe2400": 49}


def _result(c0, prot, c4, flags_int):
    total = c0 + prot
    return dict(c0_errors=c0, protected_errors=prot,
                c4_errors=c4 if c4 is not None else jnp.zeros_like(c0),
                total_errors=total, flags=flags_int)


def _pack_flags(base, fsm):
    flags = jnp.full_like(fsm["repeat"].astype(jnp.int32), base)
    if "erasure" in fsm:
        flags = flags | jnp.where(fsm["erasure"], FLAG_ERASURE, 0)
    if "tone" in fsm:
        flags = flags | jnp.where(fsm["tone"], FLAG_TONE, 0)
    flags = flags | jnp.where(fsm["repeat"], FLAG_REPEAT, 0)
    flags = flags | jnp.where(fsm["mute"], FLAG_MUTE, 0)
    return flags


def step(codec: str, frame, state: ChannelState, soft_rel=None,
         config: DecoderConfig = DEFAULT_CONFIG):
    """Full decode + process for one 20 ms frame across all channels.

    Args:
      codec: one of CODECS.
      frame: [C, rows, cols] int32 bitplanes (hard bits or soft hard
        decisions).
      state: ChannelState.
      soft_rel: [C, rows, cols] int32 reliabilities for the soft path.
      config: static DecoderConfig. config.tones_enabled=False mirrors the
        reference's DISABLE_AMBE_TONES build option (tone frames render
        silence with tone state untouched; mbelib.c:747-751). A different
        config compiles a different executable, same as a different #define
        builds a different reference library.
    Returns:
      (state', audio [C, 160] f32, result dict of [C] arrays, ambe_d
      [C, nbits]) — the public in/out layout stays channel-major; the
      internal compute (and the carried state) is channel-minor, with one
      [160, C] -> [C, 160] audio transpose and one tiny ambe_d transpose
      at the exit.
    """
    tones_enabled = config.tones_enabled
    soft = soft_rel is not None
    base = (FLAG_SOFT_INPUT if soft else 0) | FLAG_C0_VALID

    # Per-lane input validation — the vectorized MBE_STATUS_INVALID_BITS
    # (mbe_result.h:18-42). The reference rejects a frame with non-0/1 bits
    # before any output or state mutation (test_input_validation.c:72-100);
    # here invalid lanes emit silence, keep their state untouched, and
    # report result["status"] == -2. Bits are masked to {0,1} so the
    # kernels below stay total (a no-op for valid lanes), and out-of-type
    # reliabilities are clamped to the uint8 range the C type enforces.
    if config.validate_lanes:
        lanes_valid = bit_ops.bits_valid(frame)
        frame = frame & 1
        if soft:
            soft_rel = jnp.clip(jnp.asarray(soft_rel, jnp.int32), 0, 255)
    else:
        lanes_valid = None

    # hard IMBE paths thread the field-forward packed words straight into
    # the parameter decode; the [88, C] bit-plane `d` is only materialized
    # where a caller reads it (XLA DCEs the expansion inside run_sequence,
    # which discards it — VERDICT r4 #1, no plane->word round trip)
    words = None
    if codec == "imbe7200":
        if soft_rel is None:
            d, c0, prot, c4, words = imbe.decode_imbe7200_frame(
                frame, return_words=True)
        else:
            d, c0, prot, c4 = imbe.decode_imbe7200_frame(frame, soft_rel)
        base |= FLAG_C4_VALID
    elif codec == "imbe7100":
        if soft_rel is None:
            d, c0, prot, c4, words = imbe.decode_imbe7100_frame(
                frame, return_words=True)
        else:
            d, c0, prot, c4 = imbe.decode_imbe7100_frame(frame, soft_rel)
        base |= FLAG_C4_VALID
    elif codec in ("ambe2450", "ambe2400"):
        d, c0, prot = ambe.decode_ambe3600_frame(frame, soft_rel)
        c4 = jnp.zeros_like(c0)
    else:
        raise ValueError(f"unknown codec {codec!r}")

    total = c0 + prot
    true_mask = jnp.ones_like(c0, dtype=bool)

    # enh may be dropped from the carried state for IMBE-only streams
    # (init_state(carry_enh=False)): enh == cur at every IMBE step boundary,
    # so the incoming cur doubles as prev_mp_enhanced. AMBE genuinely
    # mutates enh separately and needs the real copy.
    enh_in = state.enh if state.enh is not None else state.cur
    if codec.startswith("imbe"):
        audio, cur, prev, enh, rng, lcgp, fsm = imbe.process_imbe4400(
            d, total, c0, true_mask, c4, true_mask,
            state.cur, state.prev, enh_in, state.comfort_rng,
            state.lcg_prime, words=words)
        if state.enh is None:
            enh = None
    elif codec == "ambe2450":
        if state.enh is None:
            raise ValueError("AMBE steps require a carried enh state; "
                             "use init_state(carry_enh=True)")
        audio, cur, prev, enh, rng, lcgp, fsm = ambe.process_ambe2450(
            d, total, c0, true_mask, state.cur, state.prev, enh_in,
            state.comfort_rng, state.lcg_prime, tones_enabled=tones_enabled)
    else:
        if state.enh is None:
            raise ValueError("AMBE steps require a carried enh state; "
                             "use init_state(carry_enh=True)")
        audio, cur, prev, enh, rng, lcgp, fsm = ambe.process_ambe2400(
            d, total, c0, true_mask, state.cur, state.prev, enh_in,
            state.comfort_rng, state.lcg_prime, tones_enabled=tones_enabled)

    new_state = ChannelState(cur=cur, prev=prev, enh=enh, comfort_rng=rng,
                             lcg_prime=lcgp)

    res = _result(c0, prot, c4, _pack_flags(base, fsm))
    if lanes_valid is None:
        res["status"] = jnp.zeros_like(c0)
        return new_state, audio.T, res, d.T

    # invalid lanes: silence out, state rolled back, zeroed result counts
    # (the C returns MBE_STATUS_INVALID_BITS before touching anything).
    # State leaves are channel-minor: the mask broadcasts on leading axes.
    def lane_sel(new, old):
        v = lanes_valid.reshape((1,) * (new.ndim - 1) + (-1,))
        return jnp.where(v, new, old)

    new_state = jax.tree.map(lane_sel, new_state, state)
    audio = jnp.where(lanes_valid[None, :], audio, 0.0)
    res = {k: jnp.where(lanes_valid, v, 0) for k, v in res.items()}
    res["status"] = jnp.where(lanes_valid, STATUS_OK,
                              STATUS_INVALID_BITS).astype(jnp.int32)
    d = jnp.where(lanes_valid[None, :], d, 0)
    return new_state, audio.T, res, d.T


def step_int16(codec: str, frame, state: ChannelState, soft_rel=None,
               config: DecoderConfig = DEFAULT_CONFIG):
    """step() + float->int16 conversion (the `short` API variants)."""
    new_state, audio, res, d = step(codec, frame, state, soft_rel, config)
    return new_state, synth_ops.float_to_short(audio), res, d


def run_sequence(codec: str, frames, state: ChannelState, soft_rel=None,
                 int16=False, config: DecoderConfig = DEFAULT_CONFIG,
                 unroll: int = 1):
    """Scan a [T, C, rows, cols] frame sequence through the decoder.

    Returns (state', pcm [T, C, 160], results dict of [T, C] arrays).

    `unroll` repeats the frame body that many times per scan iteration
    (lax.scan's native unroll), letting XLA keep the intermediate decoder
    state in VMEM between unrolled frames instead of round-tripping the
    full carry (3.4 KB/channel) through HBM every frame: measured 1.07x
    end-to-end at unroll=2 and 1.10x at unroll=4 (C=32768 imbe7200 hard,
    tools/t_unroll2.py, 2026-08-19), for ~2x / ~4x the compile time.
    Bit-domain outputs (error counts, flags, integer state) are exactly
    unchanged; float PCM can differ at the XLA excess-precision/fusion
    level (measured <=1.5e-4 rel — test_run_sequence_unroll_parity), the
    same tolerance class as a compiler upgrade.
    """
    int16 = int16 or config.int16_output

    def body(st, inp):
        if soft_rel is None:
            fr, sr = inp, None
        else:
            fr, sr = inp
        st, audio, res, _ = step(codec, fr, st, sr, config)
        if int16:
            audio = synth_ops.float_to_short(audio)
        return st, (audio, res)

    inputs = frames if soft_rel is None else (frames, soft_rel)
    state, (pcm, results) = jax.lax.scan(body, state, inputs, unroll=unroll)
    return state, pcm, results
