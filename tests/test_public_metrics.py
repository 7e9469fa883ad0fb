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


def test_model_selection_workflow(mmctm_fixture):
    """K-selection by held-out likelihood on a small synthetic corpus."""
    import numpy as np

    from multimodalmusig_tpu.model_selection import (
        heldout_ll_curve,
        select_k_mmctm,
        train_test_split_docs,
    )

    rng = np.random.default_rng(0)
    X = []
    for d in range(12):
        docs = []
        for V in (6, 5):
            counts = rng.integers(0, 6, size=V)
            idx = np.nonzero(counts)[0]
            docs.append(np.stack([idx + 1, counts[idx]], axis=1))
        X.append(docs)

    train, test = train_test_split_docs(X, 0.25, seed=1)
    assert len(train) + len(test) == 12 and len(test) == 3

    curve = heldout_ll_curve(
        [[2, 2], [3, 2]], train, test, [0.1, 0.1], restarts=1, maxiter=10,
        heldout_maxiter=5,
    )
    assert len(curve) == 2
    for k, ll in curve:
        assert len(ll) == 2 and np.all(np.isfinite(ll))

    best_k, curve = select_k_mmctm(
        [[2, 2], [3, 2]], X, [0.1, 0.1], restarts=1, maxiter=10,
        heldout_maxiter=5,
    )
    assert best_k in ([2, 2], [3, 2])
