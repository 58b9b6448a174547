"""Minimal repro of the jax-0.9.0 TPU wrong-code bug worked around in
models/imbe.py (mixed-offset slice/stack miscompile). Prints one
machine-readable SUMMARY line consumed by tests/test_xla_canary.py:

    SUMMARY bad_reproduces=<0|1> workaround_ok=<0|1> jax=<version>

bad_reproduces=1 means the barrier in imbe.py is still needed; when a jax
upgrade flips it to 0 the canary test fails loudly so the workaround can
be retired (reference CI-analog: the sanitizer matrix in
/root/reference/.github/workflows/ci.yml:19-191).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
x = rng.integers(0, 256, (16, 7, 24), dtype=np.int32)
tpu = jax.devices()[0]
xt = jax.device_put(x, tpu)

def check(name, fn, ref):
    t = np.asarray(jax.jit(fn)(xt))
    ok = np.array_equal(t, ref)
    print(f"{name:34s} ok={ok}" + ("" if ok else f"  ndiff={(t!=ref).sum()}"))
    return ok

ref_stack = np.stack([x[:, 1, 1:24], x[:, 2, :23], x[:, 3, :23]], axis=1)
bad_ok = check("stack mixed offsets", lambda a: jnp.stack(
    [a[:, 1, 1:24], a[:, 2, :23], a[:, 3, :23]], axis=1), ref_stack)
check("slice [:,2,:23] alone", lambda a: a[:, 2, :23], x[:, 2, :23])
check("slice [:,1,1:24] alone", lambda a: a[:, 1, 1:24], x[:, 1, 1:24])
check("stack same offset :23", lambda a: jnp.stack(
    [a[:, 1, :23], a[:, 2, :23], a[:, 3, :23]], axis=1),
    np.stack([x[:, 1, :23], x[:, 2, :23], x[:, 3, :23]], axis=1))
check("stack same offset 1:24", lambda a: jnp.stack(
    [a[:, 1, 1:24], a[:, 2, 1:24], a[:, 3, 1:24]], axis=1),
    np.stack([x[:, 1, 1:24], x[:, 2, 1:24], x[:, 3, 1:24]], axis=1))
check("stack 2 mixed", lambda a: jnp.stack(
    [a[:, 1, 1:24], a[:, 2, :23]], axis=1),
    np.stack([x[:, 1, 1:24], x[:, 2, :23]], axis=1))
# workaround candidates
check("wa: slice-after-stack", lambda a: jnp.stack(
    [jnp.roll(a[:, 1, :], -1, axis=-1)[:, :23], a[:, 2, :23], a[:, 3, :23]],
    axis=1), ref_stack)
check("wa: concat axis1 then reshape", lambda a: jnp.concatenate(
    [a[:, 1, 1:24][:, None], a[:, 2, :23][:, None], a[:, 3, :23][:, None]],
    axis=1), ref_stack)
wa_ok = check("wa: optimization_barrier slices", lambda a: jnp.stack(
    list(jax.lax.optimization_barrier(
        (a[:, 1, 1:24], a[:, 2, :23], a[:, 3, :23]))), axis=1), ref_stack)
check("wa: slice whole then stack", lambda a: jnp.stack(
    [a[:, 1, :][:, 1:24], a[:, 2, :][:, :23], a[:, 3, :][:, :23]],
    axis=1), ref_stack)
print("jax", jax.__version__)
print(f"SUMMARY bad_reproduces={int(not bad_ok)} "
      f"workaround_ok={int(wa_ok)} jax={jax.__version__} "
      f"platform={jax.devices()[0].platform}")
