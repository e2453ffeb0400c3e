from . import plot  # noqa: F401
