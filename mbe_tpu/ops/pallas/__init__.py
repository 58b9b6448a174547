from . import softecc, voiced  # noqa: F401
