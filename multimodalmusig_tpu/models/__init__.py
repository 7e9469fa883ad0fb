from . import lda  # noqa: F401
