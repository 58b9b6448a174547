"""mbe_tpu — TPU-native, massively-batched IMBE/AMBE/AMBE+2 vocoder decoder.

A from-scratch JAX/XLA re-design of the capabilities of mbelib-neo
(/root/reference): Golay/Hamming ECC, frame demodulation, MBE parameter
decode, and 8 kHz speech synthesis, vectorized over thousands of concurrent
voice channels per chip. See SURVEY.md for the structural map and
pipeline.step / pipeline.run_sequence for the main entry points.
"""

__version__ = "0.1.0"


def version_string() -> str:
    """mbe_versionString equivalent (mbelib.c:323-326)."""
    return __version__


from . import pipeline, tables  # noqa: E402,F401
from .models import state  # noqa: E402,F401
from .utils.config import DecoderConfig  # noqa: E402,F401
