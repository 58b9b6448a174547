"""Host <-> device streaming loop for continuous decode.

Per 20 ms tick, each channel needs <=24 bytes of frame bits in and 320 bytes
of PCM out — the device work dominates, so a simple double-buffered loop
(enqueue frame t+1 while frame t computes, donate the state) keeps the chip
busy.

Packed uint8 frames are shipped to the device AS BYTES and expanded to bit
lanes inside the jitted step (one shift-and-mask pass): transferring int32
bit lanes instead would inflate host->device traffic 32x (12 MB vs 0.4 MB
per step at C=16384 imbe7200), which dominates over this machine's TPU
tunnel. The host-side native unpack shim (mbe_tpu/native.py) remains for
callers that already hold bit arrays.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from .. import native, pipeline
from ..models import state as state_mod

# Fixed key order for the bundled result block (see _bundle below).
_RES_KEYS = ("c0_errors", "protected_errors", "c4_errors", "total_errors",
             "flags")


def _bundle(audio, res):
    """Concatenate the PCM block and the five per-channel int32 result
    arrays into ONE device buffer, so the host pulls a single transfer
    per tick.

    Over this machine's experimental TPU tunnel every device->host fetch
    carries a large fixed cost (tools/t_tunnel.py measured ~60-80 ms per
    round-trip on 2026-08-19), so the naive (audio, dict-of-5) fetch paid
    six fixed costs per tick — 6x the payload's wire time. The result
    words are bitcast into the PCM dtype and appended as extra columns;
    `_unbundle` reverses this loss-free on the host."""
    c = audio.shape[0]
    resw = jnp.stack([res[k].astype(jnp.int32) for k in _RES_KEYS], axis=1)
    cols = jax.lax.bitcast_convert_type(resw, audio.dtype).reshape(c, -1)
    return jnp.concatenate([audio, cols], axis=1)


def _unbundle(buf: np.ndarray, n_samples: int = 160):
    """Host-side inverse of `_bundle`: -> (audio [C,160], res dict)."""
    audio = buf[:, :n_samples]
    resw = np.ascontiguousarray(buf[:, n_samples:]).view(np.int32)
    return audio, {k: resw[:, i] for i, k in enumerate(_RES_KEYS)}


def unpack_bits_device(packed, n_bits: int):
    """[C, S] uint8 packed MSB-first -> [C, n_bits] int32 0/1 on device.

    Matches native.unpack_bits / np.unpackbits semantics (bit i of the
    stream = bit (7 - i%8) of byte i//8)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)[None, None, :]
    bits = (packed.astype(jnp.int32)[:, :, None] >> shifts) & 1
    return bits.reshape(packed.shape[0], -1)[:, :n_bits]


class StreamingDecoder:
    """Continuous batched decoder with an async in-flight window.

    Usage:
        dec = StreamingDecoder("ambe2450", channels=1024)
        for packed in frame_source:          # [C, bytes] uint8 per 20 ms
            for pcm in dec.push(packed):     # yields completed [C,160] i16
                sink(pcm)
        for pcm in dec.flush():
            sink(pcm)

    `unpack="device"` (default) ships packed bytes and unpacks in-step;
    `unpack="host"` expands with the native shim before transfer (32x more
    host->device bytes — kept for parity testing and bit-array callers).
    """

    def __init__(self, codec: str, channels: int, rng_seed=None,
                 depth: int = 2, int16: bool = True, unpack: str = "device"):
        self.codec = codec
        self.channels = channels
        self.rows, self.cols = pipeline.FRAME_SHAPES[codec]
        self.n_bits = self.rows * self.cols
        self._state = state_mod.init_state(channels, rng_seed)
        self._int16 = int16
        self._unpack_mode = unpack

        def _finish(st, audio, res):
            if int16:
                from ..ops import synth as synth_ops
                audio = synth_ops.float_to_short(audio)
            return st, _bundle(audio, res)

        def _step(frame, state):
            return _finish(*pipeline.step(codec, frame, state)[:3])

        def _step_packed(packed, state):
            frame = unpack_bits_device(packed, self.n_bits).reshape(
                channels, self.rows, self.cols)
            return _finish(*pipeline.step(codec, frame, state)[:3])

        self._step = jax.jit(_step, donate_argnums=(1,))
        self._step_packed = jax.jit(_step_packed, donate_argnums=(1,))
        self._inflight = collections.deque()
        self._depth = depth

    def _unpack(self, packed: np.ndarray) -> np.ndarray:
        bits = native.unpack_bits(
            packed.reshape(self.channels, -1), self.n_bits)
        return bits.reshape(self.channels, self.rows, self.cols)

    def push(self, packed_frames: np.ndarray):
        """Feed one 20 ms frame for every channel ([C, bytes] uint8 or
        [C, rows, cols] 0/1 int). Yields completed PCM blocks (may be empty
        while the pipeline fills)."""
        if packed_frames.dtype == np.uint8 and packed_frames.ndim == 2:
            if self._unpack_mode == "device":
                self._state, bundle = self._step_packed(
                    packed_frames, self._state)
            else:
                self._state, bundle = self._step(
                    self._unpack(packed_frames), self._state)
        else:
            frame = np.asarray(packed_frames, np.int32)
            self._state, bundle = self._step(frame, self._state)
        self._inflight.append(bundle)
        while len(self._inflight) > self._depth:
            yield _unbundle(np.asarray(self._inflight.popleft()))

    def flush(self):
        while self._inflight:
            yield _unbundle(np.asarray(self._inflight.popleft()))
