"""Convergence checks for the CAVI outer loops.

Reference: src/common.jl:48-56 — max relative change between the last two
log-likelihood entries, one dispatch for multi-modal (vector metric) and
one for scalar metrics. Here a single broadcast handles both.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["relative_change", "check_convergence", "MIN_ITERS_BEFORE_CONVERGENCE"]

# The reference only starts testing convergence once `length(ll) > 10`
# (src/LDA.jl:216, src/MMCTM.jl:485, src/IMMCTM.jl:459).
MIN_ITERS_BEFORE_CONVERGENCE = 10


def relative_change(prev: jnp.ndarray, curr: jnp.ndarray) -> jnp.ndarray:
    """max(|prev - curr| / |curr|) over all metric entries."""
    return jnp.max(jnp.abs(prev - curr) / jnp.abs(curr))


def check_convergence(prev: jnp.ndarray, curr: jnp.ndarray, tol: float = 1e-4) -> jnp.ndarray:
    """True when the relative change between successive metrics is < tol.

    `prev`/`curr` are the last two entries of the log-likelihood history
    (scalars for LDA/ILDA, (M,) vectors for MMCTM/IMMCTM), matching both
    dispatches of src/common.jl:48-56.
    """
    return relative_change(prev, curr) < tol
