"""ctypes bindings for the host-side native helpers (native/mbe_host.c).

Falls back to numpy implementations when the shared library hasn't been
built (tools/build_native.sh); both paths produce identical results (see
tests/test_native.py).
"""

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "data", "libmbehost.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        _lib = ctypes.CDLL(_LIB_PATH)
    return _lib


def available() -> bool:
    return _load() is not None


def unpack_bits(packed: np.ndarray, n_bits: int) -> np.ndarray:
    """[F, stride_bytes] uint8 packed MSB-first -> [F, n_bits] int32 0/1."""
    packed = np.ascontiguousarray(packed, np.uint8)
    if packed.ndim == 1:
        packed = packed[None]
    f, stride = packed.shape
    lib = _load()
    if lib is None:
        bits = np.unpackbits(packed, axis=1)[:, :n_bits]
        return bits.astype(np.int32)
    out = np.empty((f, n_bits), np.int32)
    lib.mbe_host_unpack_bits(
        packed.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(stride),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(f),
        ctypes.c_size_t(n_bits))
    return out


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """[F, n_bits] int32 0/1 -> [F, ceil(n/8)] uint8 MSB-first."""
    bits = np.ascontiguousarray(bits, np.int32)
    f, n = bits.shape
    stride = (n + 7) // 8
    lib = _load()
    if lib is None:
        return np.packbits(bits.astype(np.uint8), axis=1)[:, :stride]
    out = np.empty((f, stride), np.uint8)
    lib.mbe_host_pack_bits(
        bits.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(f),
        ctypes.c_size_t(n), ctypes.c_size_t(stride))
    return out


def interleave_pcm(pcm: np.ndarray) -> np.ndarray:
    """[C, S] int16 -> [S, C] int16 interleaved."""
    pcm = np.ascontiguousarray(pcm, np.int16)
    c, s = pcm.shape
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(pcm.T)
    out = np.empty((s, c), np.int16)
    lib.mbe_host_interleave_pcm(
        pcm.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_size_t(c), ctypes.c_size_t(s))
    return out


def scatter_bits(bits: np.ndarray, index: np.ndarray,
                 n_out: int) -> np.ndarray:
    """out[f, k] = bits[f, index[k]]; index -1 -> 0 fill."""
    bits = np.ascontiguousarray(bits, np.int32)
    index = np.ascontiguousarray(index, np.int32)
    f, n_in = bits.shape
    lib = _load()
    if lib is None:
        safe = np.clip(index, 0, n_in - 1)
        out = bits[:, safe]
        # C (mbe_host_scatter_bits) zero-fills ANY out-of-range index,
        # negative or >= n_in.
        out[:, (index < 0) | (index >= n_in)] = 0
        return out.astype(np.int32)
    out = np.empty((f, n_out), np.int32)
    lib.mbe_host_scatter_bits(
        bits.ctypes.data_as(ctypes.c_void_p),
        index.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_size_t(f), ctypes.c_size_t(n_in), ctypes.c_size_t(n_out))
    return out
