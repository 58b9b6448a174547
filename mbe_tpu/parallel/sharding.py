"""Multi-chip scale-out: pure data parallelism over the channel axis.

The decoder has no cross-channel math (SURVEY.md §5: each stream's state
lives on one chip; no collectives in the hot path), so multi-chip scaling is
a `jax.sharding.Mesh` over channels with every leaf sharded on its channel
axis (trailing for the channel-minor state leaves, leading for the public
frame/PCM arrays). Host I/O per channel is tiny (<=96 bits in, 320 B PCM
out per 20 ms), ideal for double-buffered device_put + donated state.
"""


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import pipeline
from ..models import state as state_mod


def channel_mesh(devices=None, axis_name: str = "ch") -> Mesh:
    """1-D device mesh over the channel axis."""
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices, (axis_name,))


def shard_state(state: state_mod.ChannelState, mesh: Mesh,
                axis_name: str = "ch") -> state_mod.ChannelState:
    """Shard every state leaf along its channel axis.

    State leaves are channel-MINOR (scalars [C], band arrays [57, C] —
    models/state.py), so the sharded axis is the trailing one. Frame
    inputs and PCM outputs stay channel-major and are sharded on their
    leading axis by the step/sequence wrappers below."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, state_spec(x, axis_name)))
    return jax.tree.map(put, state)


def state_spec(x, axis_name: str = "ch") -> P:
    """PartitionSpec for one state leaf: channel axis = trailing dim.

    Single source of truth for the channel-minor state layout rule, shared
    by shard_state and the multi-host tooling (tools/multihost_smoke.py)."""
    return P(*([None] * (x.ndim - 1)), axis_name)


def sharded_step(codec: str, mesh: Mesh, axis_name: str = "ch",
                 donate: bool = True):
    """jit-compiled decode+synth step with channel-sharded in/out.

    Returns fn(frame [C,rows,cols], state) -> (state', pcm [C,160], result).
    The state is donated so per-frame updates are in-place on device.
    """
    data_spec = NamedSharding(mesh, P(axis_name))

    def _step(frame, state):
        st, audio, res, _ = pipeline.step(codec, frame, state)
        return st, audio, res

    # out_shardings left unset: XLA propagates the channel sharding from the
    # inputs to every [C, ...] output (verified by test_sharding.py).
    return jax.jit(_step,
                   in_shardings=(data_spec, None),
                   donate_argnums=(1,) if donate else ())


def sharded_sequence(codec: str, mesh: Mesh, axis_name: str = "ch"):
    """jit-compiled lax.scan over [T, C, ...] frames with channel sharding."""
    data_spec = NamedSharding(mesh, P(None, axis_name))

    def _run(frames, state):
        return pipeline.run_sequence(codec, frames, state)

    return jax.jit(_run, in_shardings=(data_spec, None),
                   donate_argnums=(1,))


def global_channel_mesh(axis_name: str = "ch") -> Mesh:
    """Multi-host mesh over ALL processes' devices (the 16k-channel
    multi-process stretch config: jax.distributed must be initialized by the
    launcher; channels shard across every chip in the job, still with zero
    hot-path collectives — DCN only carries the host I/O of each process's
    own channel shard)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def host_local_channels(total_channels: int, axis_name: str = "ch") -> int:
    """Channels owned by this process under global sharding."""
    n_proc = jax.process_count()
    assert total_channels % n_proc == 0
    return total_channels // n_proc
