"""Host <-> device streaming loop for continuous decode.

Per 20 ms tick, each channel needs <=24 bytes of frame bits in and 320 bytes
of PCM out — the device work dominates, so a simple double-buffered loop
(enqueue frame t+1 while frame t computes, donate the state) keeps the chip
busy. Input bytes are expanded to bit lanes with the native host shim
(mbe_tpu/native.py).
"""

import collections

import jax
import numpy as np

from .. import native, pipeline
from ..models import state as state_mod


class StreamingDecoder:
    """Continuous batched decoder with an async in-flight window.

    Usage:
        dec = StreamingDecoder("ambe2450", channels=1024)
        for packed in frame_source:          # [C, bytes] uint8 per 20 ms
            for pcm in dec.push(packed):     # yields completed [C,160] i16
                sink(pcm)
        for pcm in dec.flush():
            sink(pcm)
    """

    def __init__(self, codec: str, channels: int, rng_seed=None,
                 depth: int = 2, int16: bool = True):
        self.codec = codec
        self.channels = channels
        self.rows, self.cols = pipeline.FRAME_SHAPES[codec]
        self.n_bits = self.rows * self.cols
        self._state = state_mod.init_state(channels, rng_seed)
        self._int16 = int16

        def _step(frame, state):
            st, audio, res, _ = pipeline.step(codec, frame, state)
            if int16:
                from ..ops import synth as synth_ops
                audio = synth_ops.float_to_short(audio)
            return st, audio, res

        self._step = jax.jit(_step, donate_argnums=(1,))
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
            frame = self._unpack(packed_frames)
        else:
            frame = np.asarray(packed_frames, np.int32)
        self._state, audio, res = self._step(frame, self._state)
        self._inflight.append((audio, res))
        while len(self._inflight) > self._depth:
            audio, res = self._inflight.popleft()
            yield np.asarray(audio), jax.tree.map(np.asarray, res)

    def flush(self):
        while self._inflight:
            audio, res = self._inflight.popleft()
            yield np.asarray(audio), jax.tree.map(np.asarray, res)
