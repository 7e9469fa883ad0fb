from . import ctm_base, ilda, immctm, lda, mmctm  # noqa: F401
