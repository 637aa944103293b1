from . import lilt  # noqa: F401
