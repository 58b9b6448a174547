from . import checkpoint, config, profiling  # noqa: F401
