"""Measure the trivial-body scan floor: many-leaf state vs packed state.

The ChannelState pytree has ~63 leaves; VERDICT says the trivial scan costs
0.73 ms at C=32768. Compare against the same bytes packed into few leaves.
"""
import time
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from mbe_tpu.models import state as st

C = 32768
STEPS = 200


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:28s} {best*1e3:.3f} ms/step", flush=True)
    return best


s0 = st.init_state(C)
leaves = jax.tree.leaves(s0)
print("leaves:", len(leaves), "bytes/ch:",
      sum(x.nbytes for x in leaves) / C)


@jax.jit
def scan_state(s):
    def body(ss, _):
        return ss, jnp.float32(0)
    return jax.lax.scan(body, s, None, length=STEPS)

timeit("trivial scan (63 leaves)", scan_state, s0)

# same bytes in 5 leaves: 3x [C, 57*5+16] f32-ish blocks + uw + overlap
f = jnp.zeros((C, 3 * (57 * 5 + 32)), jnp.float32)
uw = jnp.zeros((C, 3 * 256), jnp.float32)
ov = jnp.zeros((C, 3 * 96 + 16), jnp.float32)


@jax.jit
def scan_packed(a, b, c):
    def body(ss, _):
        return ss, jnp.float32(0)
    return jax.lax.scan(body, (a, b, c), None, length=STEPS)

timeit("trivial scan (3 packed)", scan_packed, f, uw, ov)


# a realistic middle ground: pack only the small [C] scalars (the 3x16
# scalar leaves), keep the [C,57] arrays separate -> ~21 leaves
arrs = [x for x in leaves if x.ndim > 1]
print("2d leaves:", len(arrs))
sc = jnp.zeros((C, 48), jnp.float32)


@jax.jit
def scan_mid(sc, arrs):
    def body(ss, _):
        return ss, jnp.float32(0)
    return jax.lax.scan(body, (sc, arrs), None, length=STEPS)

timeit("trivial scan (scalars packed)", scan_mid, sc, arrs)


# does donation change anything?
@jax.jit
def onestep_state(s):
    return jax.tree.map(lambda x: x, s)

# non-scan single dispatch cost for reference
def many(s):
    for _ in range(20):
        s = onestep_state(s)
    return s
timeit_steps = 20
out = many(s0)
jax.block_until_ready(out)
t0 = time.time()
out = many(s0)
jax.block_until_ready(out)
print(f"identity jit x20 dispatch: {(time.time()-t0)/20*1e3:.3f} ms/step")
