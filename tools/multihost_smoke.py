#!/usr/bin/env python3
"""Multi-host (multi-process) smoke test for the global channel mesh.

The reference scales by running one decoder per thread (README.md:188-199);
the rebuild's multi-host stretch config shards channels across every chip of
a multi-process JAX job (parallel/sharding.py:global_channel_mesh) with zero
hot-path collectives. Real multi-host TPU hardware isn't available here, so
this smoke test runs the REAL `jax.distributed` path on CPU:

  parent ──spawn──> golden child  (1 process, unsharded CPU run -> npz)
         ──spawn──> worker 0 \\  jax.distributed.initialize(num_processes=2),
         ──spawn──> worker 1 /   2 virtual CPU devices each -> 4-device
                                 global mesh; each worker compares its
                                 addressable shards against the golden run.

Usage:  python tools/multihost_smoke.py          (parent; exits 0 on success)
Wire-in: tests/test_multihost.py (opt-in via MBE_TPU_MULTIHOST=1) and the CI
`multihost` job run this script.
"""

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CODEC = "ambe2450"
T_FRAMES = 8          # scan length: enough to exercise FSM streaks cheaply
TILE_REPS = 4         # golden e2e channel set tiled 4x -> C divisible by 4
NUM_PROCS = 2
DEVS_PER_PROC = 2


def _child_env(extra):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVS_PER_PROC}")
    env.update(extra)
    return env


def _force_cpu():
    # the axon TPU tunnel on this host overrides JAX_PLATFORMS=cpu at the
    # env level; the config-level override sticks (CLAUDE.md gotcha)
    import jax
    jax.config.update("jax_platforms", "cpu")


def _load_inputs():
    import numpy as np
    v = np.load(os.path.join(REPO, "tests/vectors/e2e_ambe2450.npz"))
    frames = np.tile(v["frames"][:T_FRAMES],
                     (1, TILE_REPS, 1, 1)).astype(np.int32)
    seeds = np.tile(v["seeds"], TILE_REPS).astype(np.uint32)
    return frames, seeds


def _cache_config():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def run_golden(out_npz: str):
    """Single-process unsharded CPU run; writes the golden outputs."""
    _force_cpu()
    _cache_config()
    import jax
    import numpy as np
    from mbe_tpu import pipeline
    from mbe_tpu.models import state as st

    frames, seeds = _load_inputs()
    state0 = st.init_state(frames.shape[1], rng_seed=seeds)
    fin, pcm, res = jax.jit(
        lambda f, s: pipeline.run_sequence(CODEC, f, s))(frames, state0)
    np.savez(out_npz, pcm=np.asarray(pcm),
             total_errors=np.asarray(res["total_errors"]),
             ml=np.asarray(fin.cur.Ml))
    print("golden written", flush=True)


def run_worker(pid: int, port: int, golden_npz: str):
    """One process of the 2-process distributed job."""
    _force_cpu()
    import jax
    # distributed runtime must come up before any backend initializes
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=NUM_PROCS, process_id=pid)
    _cache_config()
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mbe_tpu.models import state as st
    from mbe_tpu.parallel import sharding

    assert jax.process_count() == NUM_PROCS
    assert len(jax.devices()) == NUM_PROCS * DEVS_PER_PROC, jax.devices()

    frames, seeds = _load_inputs()
    C = frames.shape[1]
    assert sharding.host_local_channels(C) == C // NUM_PROCS

    mesh = sharding.global_channel_mesh()
    fr_sh = NamedSharding(mesh, P(None, "ch", None, None))
    frames_g = jax.make_array_from_callback(
        frames.shape, fr_sh, lambda idx: frames[idx])

    # every process builds the same full-C state host-side (deterministic),
    # then reassembles it as globally-sharded arrays
    state_local = jax.tree.map(np.asarray, st.init_state(C, rng_seed=seeds))

    def globalize(x):
        # state leaves are channel-MINOR: shard the trailing axis
        # (sharding.state_spec is the single source of truth)
        sh = NamedSharding(mesh, sharding.state_spec(x))
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    state_g = jax.tree.map(globalize, state_local)

    run = sharding.sharded_sequence(CODEC, mesh)
    fin, pcm, res = run(frames_g, state_g)
    jax.block_until_ready(pcm)

    g = np.load(golden_npz)
    checked = 0
    for arr, gold, exact, name in (
            (pcm, g["pcm"], False, "pcm"),
            (res["total_errors"], g["total_errors"], True, "total_errors"),
            (fin.cur.Ml, g["ml"], False, "Ml")):
        for shard in arr.addressable_shards:
            got = np.asarray(shard.data)
            want = gold[shard.index]
            if exact:
                np.testing.assert_array_equal(got, want, err_msg=name)
            else:
                # device tiling changes f32 rounding at the 1e-7 level
                # (test_sharding.py precedent); PCM is in +-4681 float scale
                np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5,
                                           err_msg=name)
            checked += 1
    print(f"worker {pid}: {checked} shards verified "
          f"({jax.local_device_count()} local devices)", flush=True)


def main():
    mode = os.environ.get("MBE_MH_MODE")
    if mode == "golden":
        run_golden(os.environ["MBE_MH_NPZ"])
        return
    if mode == "worker":
        run_worker(int(os.environ["MBE_MH_PID"]),
                   int(os.environ["MBE_MH_PORT"]),
                   os.environ["MBE_MH_NPZ"])
        return

    # parent/orchestrator
    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "golden.npz")
        subprocess.run(
            [sys.executable, "-u", __file__],
            env=_child_env({"MBE_MH_MODE": "golden", "MBE_MH_NPZ": npz,
                            "XLA_FLAGS":
                            "--xla_force_host_platform_device_count=1"}),
            check=True, timeout=900)

        port = 21000 + os.getpid() % 9000
        workers = [
            subprocess.Popen(
                [sys.executable, "-u", __file__],
                env=_child_env({"MBE_MH_MODE": "worker",
                                "MBE_MH_PID": str(i),
                                "MBE_MH_PORT": str(port),
                                "MBE_MH_NPZ": npz}))
            for i in range(NUM_PROCS)]
        codes = [w.wait(timeout=900) for w in workers]
        if any(codes):
            raise SystemExit(f"worker exit codes {codes}")
    print("MULTIHOST SMOKE OK: 2 processes x 2 devices, shards == golden")


if __name__ == "__main__":
    main()
