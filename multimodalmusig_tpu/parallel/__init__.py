from . import restarts, sharding  # noqa: F401
from .restarts import (  # noqa: F401
    fit_ilda_restarts,
    fit_immctm_restarts,
    fit_lda_restarts,
    fit_mmctm_restarts,
    fit_restarts,
    two_stage_fit,
)
from .sharding import dryrun_multichip, make_mesh  # noqa: F401
