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


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_golden_sequence_matches_unsharded():
    """A full 30-frame golden AMBE sequence, channels tiled to 4x the
    golden set (with per-channel seeds tiled identically — required, the
    RNG streams are seeded per channel), run sharded over the mesh vs
    unsharded: int16 PCM and integer results must agree, exercising the
    branch-heavy FSM state commits (voice/tone/erasure/repeat) under
    sharding rather than a single random step."""
    from mbe_tpu.ops.synth import float_to_short

    v = np.load("tests/vectors/e2e_ambe2450.npz")
    reps = 4
    frames = np.tile(v["frames"], (1, reps, 1, 1)).astype(np.int32)
    seeds = np.tile(v["seeds"], reps).astype(np.uint32)
    C = frames.shape[1]
    assert C % len(jax.devices()) == 0 or C >= len(jax.devices())

    s_ref = st.init_state(C, rng_seed=seeds)
    ref_state, ref_audio, _ = jax.jit(
        lambda f, s: pipeline.run_sequence("ambe2450", f, s))(frames, s_ref)

    mesh = sharding.channel_mesh()
    s_sh = sharding.shard_state(st.init_state(C, rng_seed=seeds), mesh)
    run = sharding.sharded_sequence("ambe2450", mesh)
    sh_state, sh_audio, _ = run(frames, s_sh)

    ref16 = np.asarray(jax.jit(float_to_short)(ref_audio))
    sh16 = np.asarray(jax.jit(float_to_short)(sh_audio))
    # f32 tiling differences may move a sample across a truncation boundary;
    # require ≤1 LSB and overwhelmingly identical samples
    diff = np.abs(ref16.astype(np.int32) - sh16.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
    np.testing.assert_array_equal(np.asarray(sh_state.cur.L),
                                  np.asarray(ref_state.cur.L))
    np.testing.assert_array_equal(np.asarray(sh_state.cur.Vl),
                                  np.asarray(ref_state.cur.Vl))


def test_global_channel_mesh_spec_math():
    """Multi-host helpers: mesh covers every device in the job; a
    channel-sharded array places each shard on its own device; per-process
    channel ownership divides evenly (real multi-process semantics can't
    run single-host — this pins the mesh/spec math)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sharding.global_channel_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("ch",)

    ndev = len(jax.devices())
    arr = np.arange(ndev * 4 * 160, dtype=np.float32).reshape(ndev * 4, 160)
    sharded = jax.device_put(arr, NamedSharding(mesh, P("ch")))
    assert len(sharded.addressable_shards) == ndev
    for shard in sharded.addressable_shards:
        assert shard.data.shape == (4, 160)
    np.testing.assert_array_equal(np.asarray(sharded), arr)

    # single-process: this process owns all channels
    assert jax.process_count() == 1
    assert sharding.host_local_channels(1024) == 1024


def test_shard_state_places_leading_axis():
    ndev = len(jax.devices())
    mesh = sharding.channel_mesh()
    state = sharding.shard_state(st.init_state(ndev * 2), mesh)
    for leaf in jax.tree.leaves(state):
        assert len(leaf.addressable_shards) == ndev
        # channel axis is trailing on state leaves (channel-minor layout)
        assert leaf.addressable_shards[0].data.shape[-1] == 2
