"""Pallas decode kernels (interpret mode) match the XLA contractions."""

import jax
import jax.numpy as jnp
import numpy as np

from mbe_tpu.models.imbe import _decode_tables
from mbe_tpu.ops.pallas import decode as pdec


def test_vals_kernel_matches_xla():
    tb = _decode_tables()
    rng = np.random.default_rng(0)
    c = 128
    d = rng.integers(0, 2, (c, 88)).astype(np.float32)
    onehot = np.eye(48, dtype=np.float32)[rng.integers(0, 48, c)]
    wt = jnp.asarray(tb["Wt"])

    ref = np.asarray(jnp.matmul(jnp.asarray(d), wt,
                                precision=jax.lax.Precision.HIGHEST))
    ref_vals = np.einsum("cg,cgo->co", onehot, ref.reshape(c, 48, 128))
    got = np.asarray(pdec.vals_pallas(jnp.asarray(d), jnp.asarray(onehot),
                                      wt, interpret=True))
    np.testing.assert_array_equal(got, ref_vals)


def test_tl_kernel_matches_xla():
    tb = _decode_tables()
    rng = np.random.default_rng(1)
    c = 128
    cik = rng.uniform(-2, 2, (c, 60)).astype(np.float32)
    onehot = np.eye(48, dtype=np.float32)[rng.integers(0, 48, c)]
    tlm = tb["TlM2"].reshape(48, 57, 60)
    ref = np.einsum("cg,glk,ck->cl", onehot, tlm, cik)
    got = np.asarray(pdec.tl_pallas(jnp.asarray(cik), jnp.asarray(onehot),
                                    interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
