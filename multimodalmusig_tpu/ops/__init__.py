from . import convergence, solvers, special  # noqa: F401
