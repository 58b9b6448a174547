import os

# Force the CPU backend with a virtual 8-device mesh for sharding tests.
# NOTE: this environment pre-imports jax at interpreter startup (a .pth
# hook), so env vars set here are too late for jax's import-time config —
# jax.config.update still works because backends haven't initialized yet.
# XLA_FLAGS is read by the XLA runtime at backend init, so the environ
# write below does take effect.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# This box compiles XLA graphs slowly (single core); persist compilations.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MBE_TPU_JAX_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

VECTORS = os.path.join(os.path.dirname(__file__), "vectors")


@pytest.fixture(scope="session")
def vectors():
    def load(name):
        path = os.path.join(VECTORS, name + ".npz")
        if not os.path.exists(path):
            pytest.skip(f"missing golden vectors {name}.npz "
                        "(run tools/gen_vectors.py)")
        return dict(np.load(path))
    return load


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    p_sig = np.mean(ref ** 2)
    p_err = np.mean(err ** 2)
    if p_sig < 1e-12:
        return np.inf if p_err < 1e-12 else -np.inf
    return 10.0 * np.log10(p_sig / max(p_err, 1e-30))
