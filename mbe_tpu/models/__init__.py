from . import ambe, imbe, speech, spectral, state  # noqa: F401
