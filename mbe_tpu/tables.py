"""Codec constant tables, loaded once from the committed npz.

The tables were mechanically extracted from the reference implementation
(/root/reference, see tools/gen_tables.py); they are codec constants from the
IMBE/AMBE (JMBE) specifications that any compatible decoder must share.

Access via the module-level ``T`` namespace, e.g. ``tables.T.golayMatrix``.
All arrays are plain numpy; ops convert to jnp on use (so they become XLA
constants folded into the compiled executable).
"""

import os

import numpy as np

_NPZ = os.path.join(os.path.dirname(__file__), "data", "tables.npz")


class _Tables:
    def __init__(self, path: str):
        self._path = path
        self._data = None

    def _load(self):
        if self._data is None:
            self._data = dict(np.load(self._path))
            self._add_derived()
        return self._data

    def _add_derived(self):
        d = self._data
        # Packed 12-bit data parts of each Golay codeword (bits 11..22,
        # LSB-first) — equals the codeword index by construction, but keep it
        # explicit for the soft-decision tie-break compare.
        cw = d["golay_codewords"].astype(np.int64)
        d["golay_data_packed"] = (
            (cw[:, 11:] << np.arange(12, dtype=np.int64)).sum(axis=1)
        ).astype(np.int32)
        hw = d["hamming_codewords_std"].astype(np.int64)
        d["hamming_std_packed"] = (
            (hw << np.arange(15, dtype=np.int64)).sum(axis=1)).astype(np.int32)
        hw = d["hamming_codewords_7100"].astype(np.int64)
        d["hamming_7100_packed"] = (
            (hw << np.arange(15, dtype=np.int64)).sum(axis=1)).astype(np.int32)

        # Golay parity-check bit matrix: Gbits[i, p] = bit p of generator row
        # i; syndrome parity bits = data_bits @ Gbits mod 2 (ecc.c:237-244).
        gg = d["golayGenerator"].astype(np.int64)  # [12]
        d["golay_Gbits"] = (
            (gg[:, None] >> np.arange(11)[None, :]) & 1).astype(np.int32)
        # Hamming syndrome matrices: Hbits[j, i] = bit j of generator i;
        # syndrome bit i = popcount(block & gen[i]) & 1 (ecc.c:107-119).
        for name, key in (("hammingGenerator", "hamming_Hbits_std"),
                          ("imbe7100x4400hammingGenerator", "hamming_Hbits_7100")):
            hg = d[name].astype(np.int64)  # [4]
            d[key] = ((hg[None, :] >> np.arange(15)[:, None]) & 1).astype(np.int32)

    def __getattr__(self, name):
        data = self._load()
        if name in data:
            return data[name]
        raise AttributeError(name)

    def keys(self):
        return self._load().keys()


T = _Tables(_NPZ)
