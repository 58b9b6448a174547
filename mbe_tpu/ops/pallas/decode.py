"""Pallas TPU kernel: fused IMBE bit-layout decode.

The XLA path (models/imbe.py) evaluates the per-L linear bit map by
materializing Y = d @ Wt as a [C, 48*128] HBM tensor before the one-hot
group reduction — ~4.5 MB of HBM round-trip per 128 channels. This kernel
keeps Y and the Tl group expansion entirely in VMEM, so HBM traffic per
128-channel block drops to the inputs (~45 KB) and outputs (~100 KB).

Per grid step (one 128-channel block):
  1. Y = d_block @ Wt                         (MXU, f32, VMEM-resident)
  2. vals = sum_g onehot[:, g] * Y[:, g*128:] (48-step VPU accumulation)
  3. U = Cik-independent group expansion for Tl is handled by the caller's
     second call; this kernel returns `vals` (the decoded bit fields).

`tl_kernel` fuses the per-L Tl matrix selection the same way:
  Tl[c, l] = sum_g onehot[c, g] * (Cik @ TlM[g].T)[c, l]
with U = Cik @ TlMT resident in VMEM.

Numerics: identical contractions at HIGHEST precision — results match the
XLA path bit-for-bit for the integer-valued `vals` (exact f32 integer
arithmetic) and to f32 rounding for Tl.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 128  # channels per grid step
_HP = jax.lax.Precision.HIGHEST


def _vals_kernel(d_ref, onehot_ref, wt_ref, out_ref):
    d = d_ref[...]            # [CB, 88]
    wt = wt_ref[...]          # [88, 48*128]
    y = jax.lax.dot_general(d, wt, (((1,), (0,)), ((), ())),
                            precision=_HP,
                            preferred_element_type=jnp.float32)  # [CB, 6144]
    oh = onehot_ref[...]      # [CB, 48]

    acc = jnp.zeros((CB, 128), jnp.float32)
    for g in range(48):  # static unroll: dynamic_slice is not TC-lowerable
        acc = acc + oh[:, g][:, None] * y[:, g * 128:(g + 1) * 128]
    out_ref[...] = acc


def vals_pallas(d_f32, onehot, wt, interpret=False):
    """[C,88] f32 bits + [C,48] one-hot -> [C,128] decoded fields.

    C must be a multiple of 128 (pipeline pads internally)."""
    c = d_f32.shape[0]
    grid = c // CB
    return pl.pallas_call(
        _vals_kernel,
        interpret=interpret,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((CB, 88), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 48), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((88, 48 * 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32),
    )(d_f32, onehot, wt)


def _tl_kernel(cik_ref, onehot_ref, tlmt_ref, out_ref):
    cik = cik_ref[...]        # [CB, 64] (60 + pad)
    tlmt = tlmt_ref[...]      # [64, 48*64] (57 -> pad 64 per group)
    u = jax.lax.dot_general(cik, tlmt, (((1,), (0,)), ((), ())),
                            precision=_HP,
                            preferred_element_type=jnp.float32)  # [CB, 3072]
    oh = onehot_ref[...]

    acc = jnp.zeros((CB, 64), jnp.float32)
    for g in range(48):
        acc = acc + oh[:, g][:, None] * u[:, g * 64:(g + 1) * 64]
    out_ref[...] = acc


@lru_cache(maxsize=1)
def _tlmt_padded():
    from ...tables import T  # noqa: F401  (tables come via imbe cache)
    from ...models.imbe import _decode_tables
    tlm = _decode_tables()["TlM2"].reshape(48, 57, 60)
    # pad k 60->64, l 57->64; layout [k, g*64 + l]
    out = np.zeros((64, 48 * 64), np.float32)
    for g in range(48):
        out[:60, g * 64:g * 64 + 57] = tlm[g].T
    return out


def tl_pallas(cik, onehot, interpret=False):
    """[C,60] Cik + [C,48] one-hot -> Tl [C,57]."""
    c = cik.shape[0]
    cik_p = jnp.pad(cik, ((0, 0), (0, 4)))
    out = pl.pallas_call(
        _tl_kernel,
        interpret=interpret,
        grid=(c // CB,),
        in_specs=[
            pl.BlockSpec((CB, 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 48), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 48 * 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 64), jnp.float32),
    )(cik_p, onehot, jnp.asarray(_tlmt_padded()))
    return out[:, :57]
