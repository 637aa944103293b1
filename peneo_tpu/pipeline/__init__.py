from . import decode, evaluation  # noqa: F401
