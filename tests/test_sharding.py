"""Multi-device scaling over the virtual 8-device CPU mesh: sharded step
compiles, runs, and matches the unsharded result."""

import jax
import numpy as np
import pytest

from mbe_tpu import pipeline
from mbe_tpu.models import state as st
from mbe_tpu.parallel import sharding


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_step_matches_single_device():
    ndev = len(jax.devices())
    C = ndev * 2
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 2, (C, 4, 24)).astype(np.int32)

    state0 = st.init_state(C, rng_seed=np.arange(1, C + 1).astype(np.uint32))
    ref_state, ref_audio, ref_res, _ = jax.jit(
        lambda f, s: pipeline.step("ambe2450", f, s))(frame, state0)

    mesh = sharding.channel_mesh()
    state1 = sharding.shard_state(
        st.init_state(C, rng_seed=np.arange(1, C + 1).astype(np.uint32)),
        mesh)
    step = sharding.sharded_step("ambe2450", mesh, donate=False)
    new_state, audio, res = step(frame, state1)

    # sharded tiling changes f32 rounding at the 1e-7 level; integer results
    # must stay exact
    np.testing.assert_allclose(np.asarray(audio), np.asarray(ref_audio),
                               atol=1e-3, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(res["total_errors"]),
                                  np.asarray(ref_res["total_errors"]))
    np.testing.assert_allclose(np.asarray(new_state.cur.Ml),
                               np.asarray(ref_state.cur.Ml),
                               atol=1e-3, rtol=1e-4)
