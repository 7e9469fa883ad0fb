from . import restarts, sharding  # noqa: F401
from .restarts import fit_mmctm_restarts, fit_restarts, two_stage_fit  # noqa: F401
from .sharding import dryrun_multichip, make_mesh  # noqa: F401
