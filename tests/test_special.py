"""Unit tests for the shared special-function kernels (reference src/common.jl:1-9)."""

import jax.numpy as jnp
import numpy as np
from scipy.special import gammaln as sp_gammaln

from multimodalmusig_tpu.ops.special import (
    dirichlet_expectation,
    logmvbeta,
    logmvbeta_symmetric,
    safe_xlogy,
    xlogx,
)
from scipy.special import digamma as sp_digamma


def test_logmvbeta_matches_definition(rng):
    vals = rng.uniform(0.1, 5.0, size=7)
    expected = sp_gammaln(vals).sum() - sp_gammaln(vals.sum())
    np.testing.assert_allclose(float(logmvbeta(jnp.asarray(vals))), expected, rtol=1e-12)


def test_logmvbeta_batched(rng):
    vals = rng.uniform(0.1, 5.0, size=(3, 4))
    out = np.asarray(logmvbeta(jnp.asarray(vals), axis=-1))
    for i in range(3):
        expected = sp_gammaln(vals[i]).sum() - sp_gammaln(vals[i].sum())
        np.testing.assert_allclose(out[i], expected, rtol=1e-12)


def test_logmvbeta_symmetric():
    alpha, n = 0.1, 96
    expected = n * sp_gammaln(alpha) - sp_gammaln(n * alpha)
    # rtol bounded by jax-vs-scipy gammaln implementation precision
    np.testing.assert_allclose(
        float(logmvbeta_symmetric(jnp.float64(alpha), n)), expected, rtol=1e-8
    )
    # matches logmvbeta(fill(alpha, n)) as used at src/MMCTM.jl:276
    np.testing.assert_allclose(
        float(logmvbeta_symmetric(jnp.float64(alpha), n)),
        float(logmvbeta(jnp.full((n,), alpha))),
        rtol=1e-12,
    )


def test_dirichlet_expectation(rng):
    p = rng.uniform(0.5, 3.0, size=(4, 3))
    out = np.asarray(dirichlet_expectation(jnp.asarray(p), axis=0))
    expected = sp_digamma(p) - sp_digamma(p.sum(axis=0, keepdims=True))
    np.testing.assert_allclose(out, expected, rtol=1e-10)


def test_xlogx_zero_convention():
    out = np.asarray(xlogx(jnp.array([0.0, 1.0, 0.5])))
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5 * np.log(0.5)])


def test_safe_xlogy_zero_counts():
    x = jnp.array([0.0, 2.0])
    y = jnp.array([0.0, 0.5])  # log(0) would be -inf
    out = np.asarray(safe_xlogy(x, y))
    np.testing.assert_allclose(out, [0.0, 2.0 * np.log(0.5)])
