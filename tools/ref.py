"""ctypes harness for the reference libmbe-neo (oracle for golden vectors).

Only used by tools/gen_vectors.py and exploratory testing on machines where
/root/reference has been built (see tools/build_reference.sh). The committed
test vectors make the test suite independent of this module.
"""

import ctypes as C
import os

import numpy as np

_LIB_PATHS = [
    os.environ.get("MBE_REF_LIB", ""),
    "/tmp/refbuild/libmbe-neo.so",
]


class MbeParms(C.Structure):
    """Mirror of mbe_parms (include/mbelib-neo/mbelib.h:88-139)."""

    _fields_ = [
        ("w0", C.c_float),
        ("L", C.c_int),
        ("K", C.c_int),
        ("Vl", C.c_int * 57),
        ("Ml", C.c_float * 57),
        ("log2Ml", C.c_float * 57),
        ("PHIl", C.c_float * 57),
        ("PSIl", C.c_float * 57),
        ("gamma", C.c_float),
        ("tonePhase", C.c_uint32),
        ("swn", C.c_int),
        ("localEnergy", C.c_float),
        ("amplitudeThreshold", C.c_int),
        ("errorRate", C.c_float),
        ("errorCountTotal", C.c_int),
        ("errorCount4", C.c_int),
        ("repeatCount", C.c_int),
        ("mutingThreshold", C.c_float),
        ("previousUw", C.c_float * 256),
        ("noiseSeed", C.c_float),
        ("noiseOverlap", C.c_float * 96),
    ]


class MbeSoftBit(C.Structure):
    _fields_ = [("bit", C.c_uint8), ("reliability", C.c_uint8)]


class MbeProcessResult(C.Structure):
    _fields_ = [
        ("c0_errors", C.c_int),
        ("protected_errors", C.c_int),
        ("c4_errors", C.c_int),
        ("total_errors", C.c_int),
        ("flags", C.c_uint),
    ]


def load():
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            return C.CDLL(p)
    raise FileNotFoundError(
        "reference libmbe-neo.so not found; run tools/build_reference.sh")


class Ref:
    """Thin wrapper exposing the reference API over numpy arrays."""

    def __init__(self):
        self.lib = load()

    # ---- state -----------------------------------------------------------
    def init_parms(self):
        cur, prev, enh = MbeParms(), MbeParms(), MbeParms()
        self.lib.mbe_initMbeParms(C.byref(cur), C.byref(prev), C.byref(enh))
        return cur, prev, enh

    def set_seed(self, seed):
        self.lib.mbe_setThreadRngSeed(C.c_uint32(seed))

    @staticmethod
    def parms_to_dict(mp):
        return {
            "w0": np.float32(mp.w0), "L": mp.L, "K": mp.K,
            "Vl": np.array(mp.Vl[:], np.int32),
            "Ml": np.array(mp.Ml[:], np.float32),
            "log2Ml": np.array(mp.log2Ml[:], np.float32),
            "PHIl": np.array(mp.PHIl[:], np.float32),
            "PSIl": np.array(mp.PSIl[:], np.float32),
            "gamma": np.float32(mp.gamma),
            "tonePhase": np.uint32(mp.tonePhase), "swn": np.int32(mp.swn),
            "localEnergy": np.float32(mp.localEnergy),
            "amplitudeThreshold": np.int32(mp.amplitudeThreshold),
            "errorRate": np.float32(mp.errorRate),
            "errorCountTotal": np.int32(mp.errorCountTotal),
            "errorCount4": np.int32(mp.errorCount4),
            "repeatCount": np.int32(mp.repeatCount),
            "mutingThreshold": np.float32(mp.mutingThreshold),
            "previousUw": np.array(mp.previousUw[:], np.float32),
            "noiseSeed": np.float32(mp.noiseSeed),
            "noiseOverlap": np.array(mp.noiseOverlap[:], np.float32),
        }

    # ---- ECC -------------------------------------------------------------
    def _hard_ecc(self, fn, bits, n):
        inp = (C.c_char * n)(*[bytes([b]) for b in bits])
        out = (C.c_char * n)()
        errs = fn(inp, out)
        return np.frombuffer(out, np.int8).astype(np.int32), errs

    def golay2312(self, bits):
        return self._hard_ecc(self.lib.mbe_golay2312, bits, 23)

    def hamming1511(self, bits):
        return self._hard_ecc(self.lib.mbe_hamming1511, bits, 15)

    def hamming1511_7100(self, bits):
        return self._hard_ecc(self.lib.mbe_7100x4400hamming1511, bits, 15)

    def _soft_ecc(self, fn, bits, rel, n):
        inp = (MbeSoftBit * n)()
        for i in range(n):
            inp[i].bit = int(bits[i])
            inp[i].reliability = int(rel[i])
        out = (C.c_char * n)()
        errs = fn(inp, out)
        return np.frombuffer(out, np.int8).astype(np.int32), errs

    def golay2312_soft(self, bits, rel):
        return self._soft_ecc(self.lib.mbe_golay2312Soft, bits, rel, 23)

    def hamming1511_soft(self, bits, rel):
        return self._soft_ecc(self.lib.mbe_hamming1511Soft, bits, rel, 15)

    def hamming1511_7100_soft(self, bits, rel):
        return self._soft_ecc(self.lib.mbe_7100x4400hamming1511Soft, bits, rel, 15)

    # ---- frame decode / process ------------------------------------------
    _FRAME_SHAPES = {
        "imbe7200": (8, 23), "imbe7100": (7, 24),
        "ambe2400": (4, 24), "ambe2450": (4, 24),
    }
    _DBITS = {"imbe7200": 88, "imbe7100": 88, "ambe2400": 49, "ambe2450": 49}
    _FRAME_FN = {
        "imbe7200": "Imbe7200x4400", "imbe7100": "Imbe7100x4400",
        "ambe2400": "Ambe3600x2400", "ambe2450": "Ambe3600x2450",
    }
    _DATA_FN = {
        "imbe7200": "Imbe4400", "imbe7100": "Imbe4400",
        "ambe2400": "Ambe2400", "ambe2450": "Ambe2450",
    }

    def decode_frame(self, codec, frame, soft_rel=None):
        rows, cols = self._FRAME_SHAPES[codec]
        nd = self._DBITS[codec]
        d = (C.c_char * nd)()
        res = MbeProcessResult()
        if soft_rel is None:
            fr = (C.c_char * (rows * cols))(*[bytes([b]) for b in frame.ravel()])
            ret = getattr(self.lib, f"mbe_decode{self._FRAME_FN[codec]}Frame")(
                fr, d, C.byref(res))
        else:
            fr = (MbeSoftBit * (rows * cols))()
            flat_b, flat_r = frame.ravel(), soft_rel.ravel()
            for i in range(rows * cols):
                fr[i].bit, fr[i].reliability = int(flat_b[i]), int(flat_r[i])
            ret = getattr(self.lib, f"mbe_decode{self._FRAME_FN[codec]}SoftFrame")(
                fr, d, C.byref(res))
        return (np.frombuffer(d, np.int8).astype(np.int32), ret,
                dict(c0=res.c0_errors, protected=res.protected_errors,
                     c4=res.c4_errors, total=res.total_errors, flags=res.flags))

    def process_frame_f(self, codec, frame, cur, prev, enh, soft_rel=None):
        rows, cols = self._FRAME_SHAPES[codec]
        nd = self._DBITS[codec]
        d = (C.c_char * nd)()
        res = MbeProcessResult()
        buf = (C.c_float * 160)()
        if soft_rel is None:
            fr = (C.c_char * (rows * cols))(*[bytes([b]) for b in frame.ravel()])
            ret = getattr(self.lib, f"mbe_process{self._FRAME_FN[codec]}Framef")(
                buf, C.byref(res), fr, d, C.byref(cur), C.byref(prev), C.byref(enh))
        else:
            fr = (MbeSoftBit * (rows * cols))()
            flat_b, flat_r = frame.ravel(), soft_rel.ravel()
            for i in range(rows * cols):
                fr[i].bit, fr[i].reliability = int(flat_b[i]), int(flat_r[i])
            ret = getattr(self.lib, f"mbe_process{self._FRAME_FN[codec]}SoftFramef")(
                buf, C.byref(res), fr, d, C.byref(cur), C.byref(prev), C.byref(enh))
        return (np.array(buf[:], np.float32), ret,
                dict(c0=res.c0_errors, protected=res.protected_errors,
                     c4=res.c4_errors, total=res.total_errors, flags=res.flags),
                np.frombuffer(d, np.int8).astype(np.int32))

    def float_to_short(self, f):
        fin = (C.c_float * 160)(*[float(x) for x in f])
        out = (C.c_short * 160)()
        self.lib.mbe_floattoshort(fin, out)
        return np.array(out[:], np.int16)

    def process_data_f(self, codec, d_bits, cur, prev, enh, total_errors):
        """mbe_process*Dataf with a totals-only result (no C0/C4 context)."""
        nd = self._DBITS[codec]
        d = (C.c_char * nd)(*[bytes([int(b)]) for b in d_bits])
        res = MbeProcessResult()
        res.total_errors = int(total_errors)
        res.flags = 0
        buf = (C.c_float * 160)()
        fn = getattr(self.lib, f"mbe_process{self._DATA_FN[codec]}Dataf")
        ret = fn(buf, C.byref(res), d, C.byref(cur), C.byref(prev),
                 C.byref(enh))
        return (np.array(buf[:], np.float32), ret,
                dict(c0=res.c0_errors, protected=res.protected_errors,
                     c4=res.c4_errors, total=res.total_errors,
                     flags=res.flags))
