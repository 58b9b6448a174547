"""Bisect cold-compile time: time jit-compile of the full step and stages."""
import time
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# NO compilation cache: honest cold numbers
C = int(sys.argv[1]) if len(sys.argv) > 1 else 32768

from mbe_tpu import pipeline
from mbe_tpu.models import state as st, imbe, ambe
from mbe_tpu.models.state import Parms


def tc(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"{name:40s} trace+lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)
    return compiled


rng = np.random.default_rng(0)
frame = rng.integers(0, 2, (C, 8, 23), dtype=np.int32)
s0 = st.init_state(C)

which = sys.argv[2] if len(sys.argv) > 2 else "all"

if which in ("all", "step"):
    def full(s, f):
        s2, audio, res, _ = pipeline.step("imbe7200", f, s)
        return s2, jnp.sum(audio)
    tc("step(imbe7200)", full, s0, frame)

if which in ("all", "scan"):
    def scan50(s, f):
        def body(ss, _):
            s2, audio, res, _ = pipeline.step("imbe7200", f, ss)
            return s2, jnp.sum(audio)
        return jax.lax.scan(body, s, None, length=50)
    tc("scan50(step imbe7200)", scan50, s0, frame)

if which in ("all", "parms"):
    d = rng.integers(0, 2, (88, C), dtype=np.int32)  # bit-major (minor layout)
    def parms(dd, cur, prev):
        return imbe.decode_imbe4400_parms(dd, cur, prev)
    tc("decode_imbe4400_parms", parms, d, s0.cur, s0.prev)

if which in ("all", "fr"):
    def fr(f):
        return imbe.decode_imbe7200_frame(f)
    tc("decode_imbe7200_frame(hard)", fr, frame)

if which in ("all", "synth"):
    from mbe_tpu.models.speech import synthesize_speech_core
    from mbe_tpu.ops import noise
    cn = jnp.zeros((160, C), jnp.float32)
    def syn(cur, enh, cn, lcgp):
        rm0 = jnp.sum(cur.Ml * cur.Ml, axis=0)  # Ml is [57, C]
        return synthesize_speech_core(cur, enh, cn, lcgp, rm0)
    tc("synthesize_speech_core", syn, s0.cur, s0.enh, cn, s0.lcg_prime)
