from . import formatting  # noqa: F401
