"""The exp-factorized θ moments (ctm_base.theta_moments) are EXACT math —
the same sumθ / γ-scatter as contracting the materialized softmax θ, just on
a matmul schedule. These tests pin the equivalence in float64 (where matmuls
are exact) and the fit-loop wiring (factorized on/off produce matching fits).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalmusig_tpu.models import ctm_base, mmctm as mmod, immctm as imod
from multimodalmusig_tpu.models.mmctm import MMCTM, MMCTMConfig
from multimodalmusig_tpu.ops import flags


def _random_problem(rng, D=11, K=(3, 4), V=(13, 6), spread=30.0):
    """Random λ/logw/X with a wide dynamic range to stress stabilization."""
    config = MMCTMConfig(K=K, V=V, D=D, dtype=jnp.float64)
    lam = jnp.asarray(rng.normal(0, spread / 6, (D, config.MK)))
    logw = tuple(
        jnp.asarray(-rng.exponential(spread / 3, (V[m], K[m])))
        for m in range(config.M)
    )
    X = tuple(
        jnp.asarray(rng.poisson(3.0, (D, V[m])).astype(np.float64))
        for m in range(config.M)
    )
    return config, lam, logw, X


@pytest.mark.parametrize("spread", [3.0, 30.0, 80.0])
def test_factorized_moments_match_materialized(rng, spread):
    config, lam, logw, X = _random_problem(rng, spread=spread)
    theta = mmod.theta_from(lam, logw, config)
    sumtheta_ref = ctm_base.calculate_sumtheta(theta, X, config)
    scatter_ref = [
        jnp.einsum("dv,dvk->kv", X[m], theta[m]) for m in range(config.M)
    ]
    sumtheta, scatters = ctm_base.theta_moments(lam, logw, X, config)
    np.testing.assert_allclose(sumtheta, sumtheta_ref, rtol=1e-12, atol=1e-12)
    for m in range(config.M):
        np.testing.assert_allclose(
            scatters[m], scatter_ref[m], rtol=1e-12, atol=1e-12
        )


def test_factorized_moments_zero_count_docs(rng):
    """A document with zero counts in one modality contributes exactly 0."""
    config, lam, logw, X = _random_problem(rng)
    X = (X[0].at[3, :].set(0.0),) + X[1:]
    sumtheta, scatters = ctm_base.theta_moments(lam, logw, X, config)
    assert np.all(np.asarray(sumtheta[3, : config.K[0]]) == 0.0)
    assert np.all(np.isfinite(np.asarray(scatters[0])))


def test_want_scatter_false_skips_scatter(rng):
    config, lam, logw, X = _random_problem(rng)
    sumtheta, scatters = ctm_base.theta_moments(
        lam, logw, X, config, want_scatter=False
    )
    assert scatters is None
    assert sumtheta.shape == (config.D, config.MK)


def _fit_ll(fixture, factorized, monkeypatch):
    monkeypatch.setattr(flags, "THETA_FACTORIZED", factorized)
    model = MMCTM(fixture["K"], fixture["alpha"], fixture["X"], seed=7)
    ll = model.fit(maxiter=25, verbose=False)
    return np.asarray(ll), model


def test_fit_matches_with_and_without_factorization(mmctm_fixture, monkeypatch):
    """Full fits agree in float64 — the factorization changes the schedule,
    not the math. (jit caches key on the traced path because maxiter etc.
    are static and the two paths trace different graphs.)"""
    ll_f, m_f = _fit_ll(mmctm_fixture, True, monkeypatch)
    ll_m, m_m = _fit_ll(mmctm_fixture, False, monkeypatch)
    np.testing.assert_allclose(ll_f, ll_m, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(m_f.state.lam), np.asarray(m_m.state.lam), rtol=1e-7, atol=1e-9
    )


def test_immctm_fit_matches_with_and_without_factorization(monkeypatch):
    # the reference's hand-computed IMMCTM fixture (test/immctm.jl:6-51)
    features = [
        np.array([[1, 1], [1, 2], [2, 1], [2, 2]]),
        np.array([[1, 1], [1, 2], [2, 1], [2, 2]]),
    ]
    X = [
        [np.array([[1, 5], [2, 8]]), np.array([[1, 2], [2, 5]])],
        [np.array([[3, 4], [4, 9]]), np.array([[3, 4], [4, 6]])],
    ]

    def run(factorized):
        monkeypatch.setattr(flags, "THETA_FACTORIZED", factorized)
        model = imod.IMMCTM([2, 3], [0.1, 0.1], features, X, seed=7)
        ll = model.fit(maxiter=20, verbose=False)
        return np.asarray(ll), model

    ll_f, m_f = run(True)
    ll_m, m_m = run(False)
    np.testing.assert_allclose(ll_f, ll_m, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(m_f.state.lam), np.asarray(m_m.state.lam), rtol=1e-7, atol=1e-9
    )
