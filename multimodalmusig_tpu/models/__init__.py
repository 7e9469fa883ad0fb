from . import lda, mmctm  # noqa: F401
