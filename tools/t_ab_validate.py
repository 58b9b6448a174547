#!/usr/bin/env python3
"""A/B: cost of the per-lane validation + full-state rollback select.

pipeline.step with config.validate_lanes=True ends with a tree-wide
jnp.where over the ENTIRE new-vs-old ChannelState (pipeline.py:148-157) —
at C=32768 that is ~83 MB of Parms leaves read twice and written once per
Parms copy, on top of bits_valid + frame masking at entry. This measures
what that actually costs end-to-end (is it the unaccounted residual?).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.ab_bench import ab, init_for  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mbe_tpu import pipeline  # noqa: E402
from mbe_tpu.utils.config import DecoderConfig  # noqa: E402


def build(codec, channels, steps, config):
    rows, cols = pipeline.FRAME_SHAPES[codec]
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 2, (channels, rows, cols), dtype=np.int32))

    def body(carry, _):
        s, acc = carry
        s2, audio, res, _ = pipeline.step(codec, frame, s, config=config)
        return (s2, acc + jnp.sum(audio)), 0

    return jax.jit(lambda s0: jax.lax.scan(
        body, (s0, jnp.float32(0)), None, length=steps)[0])


def main():
    codec = sys.argv[1] if len(sys.argv) > 1 else "imbe7200"
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    steps = 50
    fn_a = build(codec, channels, steps, DecoderConfig(validate_lanes=True))
    fn_b = build(codec, channels, steps, DecoderConfig(validate_lanes=False))
    ta, tb = ab(fn_a, fn_b, channels, steps, rounds=4, codec=codec)
    print(f"{codec} C={channels}: validate=on {ta*1e3:.3f} ms  "
          f"validate=off {tb*1e3:.3f} ms  delta {(ta-tb)*1e3:.3f} ms "
          f"({(ta-tb)/ta*100:.1f}% of step)")


if __name__ == "__main__":
    main()
