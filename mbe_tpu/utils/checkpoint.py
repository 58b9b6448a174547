"""Channel-state snapshot / resume.

The complete resumable state of every stream is the ChannelState pytree
(plain arrays, no pointers — the reference's equivalent is the caller-owned
mbe_parms triplet, SURVEY.md §5). Snapshots are a single npz; loading
restores decoding bit-for-bit (all sequential state — phases, WOLA overlap,
LCG seeds, error IIRs, RNG limbs — lives in the pytree).
"""

import dataclasses

import jax
import numpy as np

from ..models.state import ChannelState, Parms


def save(path: str, state: ChannelState) -> None:
    leaves = {}
    for name in ("cur", "prev", "enh"):
        p = getattr(state, name)
        if p is None:  # slim IMBE carry (init_state(carry_enh=False))
            continue
        for f in dataclasses.fields(p):
            leaves[f"{name}.{f.name}"] = np.asarray(getattr(p, f.name))
    leaves["comfort_rng"] = np.asarray(state.comfort_rng)
    leaves["lcg_prime"] = np.asarray(state.lcg_prime)
    np.savez_compressed(path, **leaves)


def load(path: str, device=None) -> ChannelState:
    data = dict(np.load(path, allow_pickle=False))

    def parms(prefix):
        kw = {k.split(".", 1)[1]: jax.device_put(v, device)
              for k, v in data.items() if k.startswith(prefix + ".")}
        return Parms(**kw) if kw else None

    return ChannelState(
        cur=parms("cur"), prev=parms("prev"), enh=parms("enh"),
        comfort_rng=jax.device_put(data["comfort_rng"], device),
        lcg_prime=jax.device_put(data["lcg_prime"], device))
