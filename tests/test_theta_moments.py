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


def test_f32_joint_underflow_is_the_known_gap():
    """The one place the factorized schedule is NOT equivalent to the
    materialized softmax (and the fit machinery's safety net for it):
    anti-correlated λ/logw argmaxes with both spreads > ~88 nats flush the
    f32 normalizer Z to 0, giving non-finite moments where the joint-max
    softmax stays exact. The e_step propagates the NaN into the lane's ll,
    which run_cavi terminates and restart selection masks — fail-safe, not
    silent (ctm_base.theta_moments docstring)."""
    K, V, D = (2,), (3,), 2
    config = MMCTMConfig(K=K, V=V, D=D, dtype=jnp.float32)
    # doc 0 peaks on topic 0 while vocab item 0 peaks on topic 1; both
    # spreads are 120 nats, so every joint term at (0, 0) is ~e^-120
    lam = jnp.asarray([[0.0, -120.0], [0.0, -1.0]], jnp.float32)
    logw = (
        jnp.asarray([[-120.0, 0.0], [-60.0, -60.0], [0.0, -1.0]], jnp.float32),
    )
    X = (jnp.ones((D, V[0]), jnp.float32),)

    sumtheta, _ = ctm_base.theta_moments(lam, logw, X, config)
    sumtheta = np.asarray(sumtheta)
    assert not np.isfinite(sumtheta[0]).all()  # the pathological document
    assert np.isfinite(sumtheta[1]).all()      # ordinary documents unharmed

    theta = ctm_base.theta_from(lam, logw, config)
    ref = np.asarray(ctm_base.calculate_sumtheta(theta, X, config))
    assert np.isfinite(ref).all()              # materialized path is exact
    np.testing.assert_allclose(sumtheta[1], ref[1], rtol=1e-6)

    # float64 pushes the threshold to ~708 nats — same inputs are exact
    config64 = MMCTMConfig(K=K, V=V, D=D, dtype=jnp.float64)
    s64, _ = ctm_base.theta_moments(
        lam.astype(jnp.float64),
        (logw[0].astype(jnp.float64),),
        (X[0].astype(jnp.float64),),
        config64,
    )
    np.testing.assert_allclose(np.asarray(s64), ref, rtol=1e-6)


def test_want_scatter_false_skips_scatter(rng):
    config, lam, logw, X = _random_problem(rng)
    sumtheta, scatters = ctm_base.theta_moments(
        lam, logw, X, config, want_scatter=False
    )
    assert scatters is None
    assert sumtheta.shape == (config.D, config.MK)


class _ArmRunner:
    """Run fit arms under a trace-time flag flip, NON-vacuously.

    flags.THETA_FACTORIZED is read at trace time (ctm_base.theta_moments_auto)
    and jax's jit cache keys on (function, shapes, statics) — NOT on module
    state — so flipping the flag after the first arm's fit has compiled would
    silently rerun the first arm's executable and compare it against itself.
    jax.clear_caches() before each arm forces a fresh trace that re-reads the
    flag, and a counter on ctm_base.theta_moments proves which path traced
    (factorized arm: called; materialized arm: never). Caches are cleared
    again afterwards so no executable traced under a patched flag leaks into
    later tests that run with the default.
    """

    def __init__(self, monkeypatch):
        self.monkeypatch = monkeypatch
        self.fact_calls = 0
        orig = ctm_base.theta_moments

        def counting(*a, **k):
            self.fact_calls += 1
            return orig(*a, **k)

        monkeypatch.setattr(ctm_base, "theta_moments", counting)

    def run(self, factorized, fit_fn):
        self.monkeypatch.setattr(flags, "THETA_FACTORIZED", factorized)
        jax.clear_caches()
        before = self.fact_calls
        out = fit_fn()
        traced_factorized = self.fact_calls > before
        assert traced_factorized == factorized, (
            "the flag flip did not change the traced path — the A/B is vacuous"
        )
        return out


@pytest.fixture
def arm_runner(monkeypatch):
    r = _ArmRunner(monkeypatch)
    yield r
    jax.clear_caches()


def test_fit_matches_with_and_without_factorization(mmctm_fixture, arm_runner):
    """Full fits agree in float64 — the factorization changes the schedule,
    not the math."""

    def fit():
        model = MMCTM(
            mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"],
            seed=7,
        )
        ll = model.fit(maxiter=25, verbose=False)
        return np.asarray(ll), model

    ll_f, m_f = arm_runner.run(True, fit)
    ll_m, m_m = arm_runner.run(False, fit)
    np.testing.assert_allclose(ll_f, ll_m, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(m_f.state.lam), np.asarray(m_m.state.lam), rtol=1e-7, atol=1e-9
    )


def test_immctm_fit_matches_with_and_without_factorization(arm_runner):
    # the reference's hand-computed IMMCTM fixture (test/immctm.jl:6-51)
    features = [
        np.array([[1, 1], [1, 2], [2, 1], [2, 2]]),
        np.array([[1, 1], [1, 2], [2, 1], [2, 2]]),
    ]
    X = [
        [np.array([[1, 5], [2, 8]]), np.array([[1, 2], [2, 5]])],
        [np.array([[3, 4], [4, 9]]), np.array([[3, 4], [4, 6]])],
    ]

    def fit():
        model = imod.IMMCTM([2, 3], [0.1, 0.1], features, X, seed=7)
        ll = model.fit(maxiter=20, verbose=False)
        return np.asarray(ll), model

    ll_f, m_f = arm_runner.run(True, fit)
    ll_m, m_m = arm_runner.run(False, fit)
    np.testing.assert_allclose(ll_f, ll_m, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(m_f.state.lam), np.asarray(m_m.state.lam), rtol=1e-7, atol=1e-9
    )
