"""Lane-occupancy hypothesis test: [C,57] (channel-major) vs [57,C]
(channel-minor) for the VPU-bound decode/synthesis band math.

On TPU the minor-most dim maps to the 128-wide lane axis. A [C,57] f32
array pads 57 -> 128 lanes (44.5% occupancy); [57,C] puts C in lanes
(full occupancy, 57 -> 64 sublanes, 89%). If the step's residual is
VPU-bound elementwise work over [C,57] arrays, channel-minor should win
~2x on those kernels. Measures three representative shapes:

1. the 88-step scatter-add loop from decode_imbe4400_parms
2. a fused elementwise chain over five [C,57] band arrays
3. the 60-step Tl select chain

Everything inside one device-side scan per variant (tunnel latency rule),
outputs consumed via sum.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
XS = jnp.arange(1, STEPS + 1, dtype=jnp.float32)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, (time.time() - t0) / STEPS)
    print(f"{name:38s} {best*1e3:.3f} ms/step", flush=True)
    return out, best


def scan_over(body, *args):
    @jax.jit
    def run(*a):
        def step(acc, x):
            return acc + body(x, *a), 0.0
        return jax.lax.scan(step, jnp.float32(0), XS)[0]
    return run


rng = np.random.default_rng(0)

# --- 1. scatter-add loop ----------------------------------------------------
colsel_cm = jnp.asarray(rng.integers(0, 72, (C, 88)).astype(np.float32))
p_cm = jnp.asarray(rng.standard_normal((C, 88)).astype(np.float32))


def scatter_major(x, colsel, p):
    cols = jnp.arange(72, dtype=jnp.float32)[None, :]
    vals = jnp.zeros((C, 72), jnp.float32)
    pp = p + x  # input-dependent
    for i in range(88):
        vals = vals + jnp.where(colsel[:, i:i + 1] == cols,
                                pp[:, i:i + 1], 0.0)
    return jnp.sum(vals)


def scatter_minor(x, colsel, p):
    cols = jnp.arange(72, dtype=jnp.float32)[:, None]
    vals = jnp.zeros((72, C), jnp.float32)
    pp = p + x
    for i in range(88):
        vals = vals + jnp.where(colsel[i:i + 1, :] == cols,
                                pp[i:i + 1, :], 0.0)
    return jnp.sum(vals)


timeit("scatter-add 88->72 [C,88]", scan_over(scatter_major, colsel_cm, p_cm),
       colsel_cm, p_cm)
timeit("scatter-add 88->72 [88,C]",
       scan_over(scatter_minor, colsel_cm.T.copy(), p_cm.T.copy()),
       jnp.asarray(np.ascontiguousarray(np.asarray(colsel_cm).T)),
       jnp.asarray(np.ascontiguousarray(np.asarray(p_cm).T)))

# --- 2. elementwise band chain ----------------------------------------------
a_cm = [jnp.asarray(rng.standard_normal((C, 57)).astype(np.float32))
        for _ in range(5)]
L_cm = jnp.asarray(rng.integers(9, 57, (C,)).astype(np.int32))


def chain_major(x, a0, a1, a2, a3, a4, L):
    li = jnp.arange(57, dtype=jnp.int32)[None, :]
    m = li <= L[:, None]
    v = a0 + x
    for _ in range(6):
        v = jnp.where(m, v * a1 + a2, v)
        v = jnp.abs(v) + a3 * jnp.exp2(jnp.clip(a4, -4, 4))
        v = jnp.where(m & (v > 0.5), v - a2, v + a1)
    return jnp.sum(v)


def chain_minor(x, a0, a1, a2, a3, a4, L):
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    m = li <= L[None, :]
    v = a0 + x
    for _ in range(6):
        v = jnp.where(m, v * a1 + a2, v)
        v = jnp.abs(v) + a3 * jnp.exp2(jnp.clip(a4, -4, 4))
        v = jnp.where(m & (v > 0.5), v - a2, v + a1)
    return jnp.sum(v)


timeit("band elementwise chain [C,57]",
       scan_over(chain_major, *a_cm, L_cm), *a_cm, L_cm)
a_mn = [jnp.asarray(np.ascontiguousarray(np.asarray(t).T)) for t in a_cm]
timeit("band elementwise chain [57,C]",
       scan_over(chain_minor, *a_mn, L_cm), *a_mn, L_cm)

# --- 3. Tl-style 60-step select chain ----------------------------------------
scl_cm = jnp.asarray(rng.integers(0, 60, (C, 57)).astype(np.float32))
U_cm = jnp.asarray(rng.standard_normal((C, 60)).astype(np.float32))


def tlsel_major(x, scl, U):
    Uu = U + x
    Tl = jnp.zeros((C, 57), jnp.float32)
    for s in range(60):
        Tl = jnp.where(scl == jnp.float32(s), Uu[:, s:s + 1], Tl)
    return jnp.sum(Tl)


def tlsel_minor(x, scl, U):
    Uu = U + x
    Tl = jnp.zeros((57, C), jnp.float32)
    for s in range(60):
        Tl = jnp.where(scl == jnp.float32(s), Uu[s:s + 1, :], Tl)
    return jnp.sum(Tl)


timeit("Tl select chain [C,57]", scan_over(tlsel_major, scl_cm, U_cm),
       scl_cm, U_cm)
timeit("Tl select chain [57,C]",
       scan_over(tlsel_minor,
                 jnp.asarray(np.ascontiguousarray(np.asarray(scl_cm).T)),
                 jnp.asarray(np.ascontiguousarray(np.asarray(U_cm).T))),
       jnp.asarray(np.ascontiguousarray(np.asarray(scl_cm).T)),
       jnp.asarray(np.ascontiguousarray(np.asarray(U_cm).T)))


# --- 4. boundary transpose cost (for a hybrid layout) -------------------------
def chain_via_transpose(x, a0, a1, a2, a3, a4, L):
    """Channel-major in/out, channel-minor compute: measures whether the
    [C,57]<->[57,C] relayout eats the lane win."""
    args = [jnp.transpose(a) + 0.0 for a in (a0, a1, a2, a3, a4)]
    li = jnp.arange(57, dtype=jnp.int32)[:, None]
    m = li <= L[None, :]
    v = args[0] + x
    for _ in range(6):
        v = jnp.where(m, v * args[1] + args[2], v)
        v = jnp.abs(v) + args[3] * jnp.exp2(jnp.clip(args[4], -4, 4))
        v = jnp.where(m & (v > 0.5), v - args[2], v + args[1])
    return jnp.sum(jnp.transpose(v))


timeit("band chain [C,57]->T->[57,C]->T",
       scan_over(chain_via_transpose, *a_cm, L_cm), *a_cm, L_cm)
