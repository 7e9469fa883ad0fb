"""Pallas kernel correctness vs. the pure-jnp solvers (interpret mode on CPU;
the same kernels compile natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodalmusig_tpu.ops.pallas.lambda_kernel import maximize_lambda_fused
from multimodalmusig_tpu.ops.solvers import lambda_grad, maximize_lambda


@pytest.fixture
def problem(rng):
    MK, B = 14, 96
    A = rng.normal(size=(MK, MK))
    invS = jnp.asarray(np.eye(MK) + 0.05 * (A @ A.T) / MK, jnp.float32)
    return dict(
        lam0=jnp.zeros((B, MK), jnp.float32),
        nu=jnp.asarray(rng.uniform(0.5, 1.5, (B, MK)), jnp.float32),
        ndz=jnp.asarray(rng.uniform(1, 10, (B, MK)), jnp.float32),
        st=jnp.asarray(rng.uniform(0, 5, (B, MK)), jnp.float32),
        mu=jnp.asarray(rng.normal(size=MK), jnp.float32),
        invS=invS,
    )


def test_fused_lambda_matches_jnp_solver(problem):
    ref = np.asarray(
        maximize_lambda(
            problem["lam0"], problem["nu"], problem["ndz"], problem["st"],
            problem["mu"], problem["invS"],
        )
    )
    fused = np.asarray(
        maximize_lambda_fused(
            problem["lam0"], problem["nu"], problem["ndz"], problem["st"],
            problem["mu"], problem["invS"], tile_b=128, interpret=True,
        )
    )
    np.testing.assert_allclose(fused, ref, atol=5e-5)


def test_fused_lambda_is_stationary(problem):
    fused = maximize_lambda_fused(
        problem["lam0"], problem["nu"], problem["ndz"], problem["st"],
        problem["mu"], problem["invS"], tile_b=128, interpret=True,
    )
    g = np.asarray(
        jnp.stack(
            [
                lambda_grad(
                    fused[i], problem["nu"][i], problem["ndz"][i],
                    problem["st"][i], problem["mu"], problem["invS"],
                )
                for i in range(0, 96, 16)
            ]
        )
    )
    # float32 kernel: gradient small relative to the count scale (~10)
    assert np.abs(g).max() < 1e-2


def test_fused_lambda_ragged_batch(problem):
    """B not a multiple of tile_b exercises the padding path."""
    sl = slice(0, 33)
    fused = np.asarray(
        maximize_lambda_fused(
            problem["lam0"][sl], problem["nu"][sl], problem["ndz"][sl],
            problem["st"][sl], problem["mu"], problem["invS"],
            tile_b=128, interpret=True,
        )
    )
    ref = np.asarray(
        maximize_lambda(
            problem["lam0"][sl], problem["nu"][sl], problem["ndz"][sl],
            problem["st"][sl], problem["mu"], problem["invS"],
        )
    )
    np.testing.assert_allclose(fused, ref, atol=5e-5)


def test_mk_over_lane_budget_raises(problem):
    big = jnp.zeros((8, 200), jnp.float32)
    with pytest.raises(ValueError, match="lane budget"):
        maximize_lambda_fused(
            big, big, big, big, jnp.zeros(200), jnp.eye(200), interpret=True
        )


def test_restart_batched_fused_matches_per_lane(problem, rng):
    """Each restart lane has its own mu/invSigma; the restart-batched kernel
    must match per-lane jnp solves."""
    from multimodalmusig_tpu.ops.pallas.lambda_kernel import (
        maximize_lambda_fused_restarts,
    )

    R, D, MK = 3, 40, 14
    lam0 = jnp.zeros((R, D, MK), jnp.float32)
    nu = jnp.asarray(rng.uniform(0.5, 1.5, (R, D, MK)), jnp.float32)
    ndz = jnp.asarray(rng.uniform(1, 10, (R, D, MK)), jnp.float32)
    st = jnp.asarray(rng.uniform(0, 5, (R, D, MK)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(R, MK)), jnp.float32)
    invS = []
    for r in range(R):
        A = rng.normal(size=(MK, MK))
        invS.append(np.eye(MK) + 0.05 * (A @ A.T) / MK)
    invS = jnp.asarray(np.stack(invS), jnp.float32)

    fused = np.asarray(
        maximize_lambda_fused_restarts(
            lam0, nu, ndz, st, mu, invS, tile_b=128, interpret=True
        )
    )
    for r in range(R):
        ref = np.asarray(
            maximize_lambda(lam0[r], nu[r], ndz[r], st[r], mu[r], invS[r])
        )
        np.testing.assert_allclose(fused[r], ref, atol=5e-5)
