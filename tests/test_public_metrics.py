"""Public metric dispatch functions (reference: calculate_elbo /
calculate_loglikelihood(s) callable on models and on (X, model))."""

import numpy as np

import multimodalmusig_tpu as mm

FEATURES = np.array([[1, 1], [1, 2], [2, 1], [2, 2]])


def test_lda_metrics(lda_fixture):
    model = mm.LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
    model.fit(maxiter=20, verbose=False)
    assert np.isclose(mm.calculate_elbo(model), model.elbo, rtol=1e-6)
    assert np.isclose(mm.calculate_loglikelihood(model), model.ll, rtol=1e-6)
    # (X, model) form on a subset
    sub = mm.calculate_loglikelihood(lda_fixture["X"][:1], model)
    assert np.isfinite(sub)


def test_ilda_metrics(lda_fixture):
    model = mm.ILDA(2, 0.1, 0.1, FEATURES, lda_fixture["X"])
    model.fit(maxiter=15, verbose=False)
    assert np.isclose(mm.calculate_elbo(model), model.elbo, rtol=1e-6)
    assert np.isfinite(mm.calculate_loglikelihood(model))


def test_mmctm_metrics(mmctm_fixture):
    model = mm.MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    model.fit(maxiter=15, verbose=False)
    assert np.isclose(mm.calculate_elbo(model), model.elbo, rtol=1e-6)
    ll = mm.calculate_loglikelihoods(model)
    np.testing.assert_allclose(ll, model.ll, rtol=1e-6)
    ll_sub = mm.calculate_loglikelihoods(mmctm_fixture["X"], model)
    np.testing.assert_allclose(ll_sub, ll, rtol=1e-6)


def test_immctm_metrics(mmctm_fixture):
    model = mm.IMMCTM(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES], mmctm_fixture["X"]
    )
    model.fit(maxiter=10, verbose=False)
    assert np.isclose(mm.calculate_elbo(model), model.elbo, rtol=1e-6)
    ll = mm.calculate_loglikelihoods(model)
    np.testing.assert_allclose(ll, model.ll, rtol=1e-6)
