from . import bits, demod, ecc, noise  # noqa: F401
