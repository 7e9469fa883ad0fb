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


def test_two_phase_compaction_matches_single_shot(mmctm_fixture):
    """The 2-phase straggler fit (compact_schedule): run everyone a fixed
    budget, compact converged lanes out, finish survivors unbounded. Must
    be bit-identical to the single-dispatch fit — compaction only re-packs
    lanes, never changes any lane's trajectory."""
    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray([0.1, 0.1], model.config.dtype)
    kwargs = dict(restarts=5, maxiter=25, tol=1e-5)
    single = rmod.fit_restarts(
        jax.random.key(9), model.Xdense, model.config, alpha, **kwargs
    )
    for schedule in [(8,), (8, 6), (100,)]:
        phased = rmod.fit_restarts(
            jax.random.key(9), model.Xdense, model.config, alpha,
            compact_schedule=schedule, **kwargs
        )
        np.testing.assert_array_equal(
            np.asarray(single.n_iters), np.asarray(phased.n_iters)
        )
        np.testing.assert_allclose(
            np.asarray(single.ll), np.asarray(phased.ll), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(single.state.lam), np.asarray(phased.state.lam), rtol=1e-10
        )
        np.testing.assert_array_equal(
            np.asarray(single.converged), np.asarray(phased.converged)
        )


def test_compact_schedule_excludes_chunk_iters(mmctm_fixture):
    import pytest

    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray([0.1, 0.1], model.config.dtype)
    with pytest.raises(ValueError):
        rmod.fit_restarts(
            jax.random.key(0), model.Xdense, model.config, alpha,
            restarts=2, maxiter=5, chunk_iters=3, compact_schedule=(3,),
        )
