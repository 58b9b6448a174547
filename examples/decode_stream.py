#!/usr/bin/env python3
"""Example: decode a multi-channel P25 (IMBE 7200x4400) stream to PCM.

Demonstrates the three usage styles:
  1. one-call per-frame batch decode (pipeline.step)
  2. time-batched scan (pipeline.run_sequence)
  3. continuous streaming with packed-byte input (StreamingDecoder)

Run: python examples/decode_stream.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mbe_tpu import pipeline
from mbe_tpu.api import format_process_result
from mbe_tpu.models import state
from mbe_tpu.parallel.streaming import StreamingDecoder

CHANNELS = 64
FRAMES = 20


def main():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 2, (FRAMES, CHANNELS, 8, 23), dtype=np.int32)

    # --- style 1: per-frame steps ------------------------------------------
    st = state.init_state(CHANNELS,
                          rng_seed=np.arange(1, CHANNELS + 1).astype(np.uint32))
    st, pcm, result, _ = pipeline.step("imbe7200", frames[0], st)
    trace = format_process_result(
        {k: np.asarray(v)[0] for k, v in result.items()})
    print(f"frame 0, channel 0: total_errors="
          f"{int(np.asarray(result['total_errors'])[0])} trace={trace!r} "
          f"pcm rms={float(np.sqrt((np.asarray(pcm)[0] ** 2).mean())):.1f}")

    # --- style 2: scan over time -------------------------------------------
    st = state.init_state(CHANNELS,
                          rng_seed=np.arange(1, CHANNELS + 1).astype(np.uint32))
    st, pcm_seq, results = pipeline.run_sequence("imbe7200", frames, st)
    print(f"scan: pcm {pcm_seq.shape}, mean errors/frame="
          f"{float(np.asarray(results['total_errors']).mean()):.2f}")

    # --- style 3: streaming with packed bytes -------------------------------
    dec = StreamingDecoder("imbe7200", CHANNELS,
                           rng_seed=np.arange(1, CHANNELS + 1).astype(np.uint32))
    n_bits = 8 * 23
    out_blocks = 0
    for t in range(FRAMES):
        bits = frames[t].reshape(CHANNELS, n_bits)
        packed = np.packbits(bits.astype(np.uint8), axis=1)
        for pcm16, res in dec.push(packed):
            out_blocks += 1
    for pcm16, res in dec.flush():
        out_blocks += 1
    print(f"streaming: {out_blocks} PCM blocks of shape (C={CHANNELS}, 160)")


if __name__ == "__main__":
    main()
