from . import lambda_kernel  # noqa: F401
