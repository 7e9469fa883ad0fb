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


def test_mmctm_docmodality_matrix(mmctm_fixture):
    """The (D, M) per-document matrix must reduce to the modality-level ll
    under the reference's N_d weighting (src/MMCTM.jl:402-418)."""
    model = mm.MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    model.fit(maxiter=12, verbose=False)
    mat = mm.calculate_docmodality_loglikelihoods(model)
    assert mat.shape == (model.D, model.M)
    assert np.all(np.isfinite(mat))
    N = np.asarray(model.N, dtype=np.float64)  # (D, M)
    agg = (mat * N).sum(axis=0) / N.sum(axis=0)
    np.testing.assert_allclose(agg, mm.calculate_loglikelihoods(model), rtol=1e-8)
    # (X, model) form
    mat2 = mm.calculate_docmodality_loglikelihoods(mmctm_fixture["X"], model)
    np.testing.assert_allclose(mat2, mat, rtol=1e-12)
    # a document with zero counts in one modality gets NaN there, and the
    # aggregate (which skips such docs) stays finite — reference semantics
    # (same D as the model: props are per-document, src/MMCTM.jl:402-418)
    X3 = [
        [np.zeros((0, 2), dtype=int), mmctm_fixture["X"][0][1]],
        mmctm_fixture["X"][1],
    ]
    mat3 = mm.calculate_docmodality_loglikelihoods(X3, model)
    assert np.isnan(mat3[0, 0]) and np.isfinite(mat3[0, 1])
    assert np.all(np.isfinite(mat3[1]))
    ll3 = mm.calculate_loglikelihoods(X3, model)
    assert np.all(np.isfinite(ll3))


def test_immctm_docmodality_matrix(mmctm_fixture):
    model = mm.IMMCTM(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES], mmctm_fixture["X"]
    )
    model.fit(maxiter=8, verbose=False)
    mat = mm.calculate_docmodality_loglikelihoods(model)
    assert mat.shape == (model.D, model.M)
    assert np.all(np.isfinite(mat))
    N = np.asarray(model.N, dtype=np.float64)
    agg = (mat * N).sum(axis=0) / N.sum(axis=0)
    np.testing.assert_allclose(agg, mm.calculate_loglikelihoods(model), rtol=1e-8)


def test_transform_elbo_is_real(mmctm_fixture, lda_fixture):
    """transform results carry a computed ELBO, not the round-1 placeholder 0.0."""
    model = mm.MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    model.fit(maxiter=12, verbose=False)
    new = mm.transform(model, mmctm_fixture["X"], maxiter=12)
    assert new.elbo is not None
    assert np.isfinite(new.elbo) and new.elbo != 0.0
    assert new.elbo <= 0.0  # ELBO of a discrete-data model is non-positive

    from multimodalmusig_tpu.models import lda as lda_m

    lda = mm.LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
    lda.fit(maxiter=12, verbose=False)
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multimodalmusig_tpu.utils.formatting import sparse_to_dense

    cfg = dataclasses.replace(lda.config, D=len(lda_fixture["X"]))
    Xd = jnp.asarray(sparse_to_dense(lda_fixture["X"], cfg.V), cfg.dtype)
    fresh = lda_m.init(jax.random.key(0), cfg)
    _, result = lda_m.transform_states(lda.state, fresh, Xd, cfg, maxiter=12)
    assert np.isfinite(float(result.elbo)) and float(result.elbo) < 0.0


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

    # multi-restart sweep with the zero-config folded-pilot compaction
    # forwarded through to fit_mmctm_restarts (compact_schedule="auto")
    curve_auto = heldout_ll_curve(
        [[2, 2]], train, test, [0.1, 0.1], restarts=8, maxiter=10,
        heldout_maxiter=5, compact_schedule="auto",
    )
    assert len(curve_auto) == 1 and np.all(np.isfinite(curve_auto[0][1]))
