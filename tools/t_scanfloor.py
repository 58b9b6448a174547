"""Measure the touch-all-state scan floor: many-leaf state vs packed state.

The ChannelState pytree has ~44 leaves (slim IMBE carry); the end-of-round-2
ablation put the trivial-scan floor at ~0.73 ms at C=32768. Hypothesis
(VERDICT round-3 item #2): per-leaf kernel overhead, not bandwidth — test by
carrying the SAME bytes in 3 packed buffers.

Every variant's body adds the per-step scalar x to every leaf (int leaves:
+int(x)), so each leaf is read+written once per step — an unchanged carry is
loop-invariant and XLA hoists it, which would measure nothing (the
input-dependent-stub lesson, CLAUDE.md).
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
XS = jnp.arange(1, STEPS + 1, dtype=jnp.float32) * 1e-9


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:34s} {best*1e3:.3f} ms/step", flush=True)
    return best


def perturb(leaf, x):
    if jnp.issubdtype(leaf.dtype, jnp.floating):
        return leaf + x.astype(leaf.dtype)
    return leaf + (x * 0).astype(leaf.dtype) + jnp.ones((), leaf.dtype)


def make_scan(tree):
    @jax.jit
    def run(t):
        def body(ss, x):
            ss2 = jax.tree.map(lambda a: perturb(a, x), ss)
            # consume one element so the whole chain is live
            probe = jax.tree.leaves(ss2)[0]
            return ss2, probe.reshape(-1)[0]
        return jax.lax.scan(body, t, XS)
    return run


s0 = st.init_state(C, carry_enh=False)
leaves = jax.tree.leaves(s0)
nbytes = sum(x.nbytes for x in leaves)
print(f"leaves: {len(leaves)}  bytes/ch: {nbytes / C:.0f}  "
      f"total: {nbytes / 2**20:.0f} MiB", flush=True)

timeit("touch-all scan (pytree)", make_scan(s0), s0)

# same bytes in 3 leaves: one [C, F] f32 block, one [C, I] i32 block,
# one [C, U] u32 block
fbytes = sum(x.nbytes for x in leaves
             if jnp.issubdtype(x.dtype, jnp.floating)) // C // 4
ibytes = sum(x.nbytes for x in leaves if x.dtype == jnp.int32) // C // 4
ubytes = sum(x.nbytes for x in leaves if x.dtype == jnp.uint32) // C // 4
print(f"packed cols: f32 {fbytes}, i32 {ibytes}, u32 {ubytes}")
packed = (jnp.zeros((fbytes, C), jnp.float32),
          jnp.zeros((max(ibytes, 1), C), jnp.int32),
          jnp.zeros((max(ubytes, 1), C), jnp.uint32))
timeit("touch-all scan (3 packed)", make_scan(packed), packed)

# middle ground: [57,C]/[256,C]/[96,C] arrays separate, the ~17 [C]
# scalars packed into one [17,C] block per Parms
arrs = tuple(x for x in leaves if x.ndim > 1)
nscal = len(leaves) - len(arrs)
mid = (jnp.zeros((nscal, C), jnp.float32),) + arrs
print(f"mid: {len(mid)} leaves")
timeit("touch-all scan (scalars packed)", make_scan(mid), mid)

# bandwidth reference: one [C, total/4] f32 block, same total bytes
one = jnp.zeros((nbytes // C // 4, C), jnp.float32)
timeit("touch-all scan (1 leaf)", make_scan(one), one)
