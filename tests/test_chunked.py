"""Chunked (resumable) restart fitting must match single-shot exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalmusig_tpu.models.mmctm import MMCTM
from multimodalmusig_tpu.parallel import restarts as rmod


def test_chunked_matches_single_shot(mmctm_fixture):
    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray([0.1, 0.1], model.config.dtype)
    kwargs = dict(restarts=3, maxiter=25, tol=1e-5)
    single = rmod.fit_restarts(
        jax.random.key(9), model.Xdense, model.config, alpha, **kwargs
    )
    chunked = rmod.fit_restarts(
        jax.random.key(9), model.Xdense, model.config, alpha, chunk_iters=7, **kwargs
    )
    np.testing.assert_array_equal(
        np.asarray(single.n_iters), np.asarray(chunked.n_iters)
    )
    np.testing.assert_allclose(np.asarray(single.ll), np.asarray(chunked.ll), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(single.state.lam), np.asarray(chunked.state.lam), rtol=1e-10
    )
    np.testing.assert_array_equal(
        np.asarray(single.converged), np.asarray(chunked.converged)
    )
