"""LDA tests, porting the reference's hand-computed fixtures (test/lda.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import digamma as sp_digamma

from multimodalmusig_tpu.models import lda as lda_mod
from multimodalmusig_tpu.models.lda import LDA


class TestConstructor:
    # test/lda.jl:18-36
    def test_inferred_vocab(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        assert model.K == 2
        assert model.D == 2
        assert model.N == [13, 7]
        assert model.V == 2
        assert model.lam.shape == (2, 2)
        assert np.all(model.lam > 0)
        assert model.gamma.shape == (2, 2)
        assert np.all(model.gamma > 0)
        np.testing.assert_allclose(model.phi[0].sum(axis=0), np.ones(2))

    def test_explicit_vocab(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], 3, lda_fixture["X"])
        assert model.V == 3
        assert model.lam.shape == (3, 2)

    def test_unicode_aliases(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        np.testing.assert_array_equal(model.λ, model.lam)
        np.testing.assert_array_equal(model.γ, model.gamma)
        assert model.α == model.alpha


class TestUpdatePhi:
    # test/lda.jl:38-62
    def test_hand_computed(self, lda_fixture):
        Elntheta_ref = np.array([[0.5, -1.1], [2.3, -0.7]])  # (K, D) reference layout
        Elnbeta = np.array([[-0.2, -0.9], [-1.1, 0.3]])      # (V, K)

        expected = np.empty((2, 2))  # (K, W) for doc 1
        expected[0, 0] = np.exp(Elntheta_ref[0, 0] + Elnbeta[0, 0])
        expected[0, 1] = np.exp(Elntheta_ref[0, 0] + Elnbeta[1, 0])
        expected[1, 0] = np.exp(Elntheta_ref[1, 0] + Elnbeta[0, 1])
        expected[1, 1] = np.exp(Elntheta_ref[1, 0] + Elnbeta[1, 1])
        expected /= expected.sum(axis=0, keepdims=True)

        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        model.state = model.state._replace(
            Elntheta=jnp.asarray(Elntheta_ref.T), Elnbeta=jnp.asarray(Elnbeta)
        )
        model.state = lda_mod.update_phi(model.state)
        np.testing.assert_allclose(model.phi[0], expected, rtol=1e-10)


class TestUpdateGamma:
    # test/lda.jl:64-83
    def test_hand_computed(self, lda_fixture):
        X = lda_fixture["X"]
        alpha = lda_fixture["alpha"]
        phi_doc1 = np.array([[0.4, 0.2], [0.6, 0.8]])  # (K, W)

        gamma = np.empty(2)
        gamma[0] = alpha + phi_doc1[0, 0] * X[0][0, 1] + phi_doc1[0, 1] * X[0][1, 1]
        gamma[1] = alpha + phi_doc1[1, 0] * X[0][0, 1] + phi_doc1[1, 1] * X[0][1, 1]
        Elntheta = sp_digamma(gamma) - sp_digamma(gamma.sum())

        model = LDA(lda_fixture["K"], alpha, lda_fixture["eta"], X)
        dense_phi = np.array(lda_mod.reconstruct_phi(model.state))
        dense_phi[0] = phi_doc1.T  # (V, K)
        model.state = lda_mod.update_gamma(
            model.state, model.Xdense, model.config, jnp.asarray(dense_phi)
        )
        np.testing.assert_allclose(model.gamma[:, 0], gamma, rtol=1e-10)
        np.testing.assert_allclose(model.Elntheta[:, 0], Elntheta, rtol=1e-10)


class TestUpdateLambda:
    # test/lda.jl:85-103
    def test_hand_computed(self, lda_fixture):
        X = lda_fixture["X"]
        eta = lda_fixture["eta"]
        phi = [np.array([[0.4, 0.2], [0.6, 0.8]]), np.array([[0.1, 0.6], [0.9, 0.4]])]

        lam = np.empty((2, 2))  # (V, K)
        lam[0, 0] = eta + phi[0][0, 0] * X[0][0, 1] + phi[1][0, 0] * X[1][0, 1]
        lam[1, 0] = eta + phi[0][0, 1] * X[0][1, 1] + phi[1][0, 1] * X[1][1, 1]
        lam[0, 1] = eta + phi[0][1, 0] * X[0][0, 1] + phi[1][1, 0] * X[1][0, 1]
        lam[1, 1] = eta + phi[0][1, 1] * X[0][1, 1] + phi[1][1, 1] * X[1][1, 1]
        Elnbeta = sp_digamma(lam) - sp_digamma(lam.sum(axis=0, keepdims=True))

        model = LDA(lda_fixture["K"], lda_fixture["alpha"], eta, X)
        dense_phi = np.stack([phi[0].T, phi[1].T])  # (D, V, K)
        model.state = lda_mod.update_lambda(
            model.state, model.Xdense, model.config, jnp.asarray(dense_phi)
        )
        np.testing.assert_allclose(model.lam, lam, rtol=1e-10)
        np.testing.assert_allclose(model.Elnbeta, Elnbeta, rtol=1e-10)


class TestElbo:
    # test/lda.jl:105-118
    def test_negative_on_fresh_model(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        elbo = float(lda_mod.calculate_elbo(model.state, model.Xdense, model.config))
        assert np.isfinite(elbo)
        assert elbo < 0.0


class TestLoglikelihood:
    def test_matches_hand_mixture(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        theta = np.asarray(lda_mod.theta_point(model.state))  # (D, K)
        beta = np.asarray(lda_mod.beta_point(model.state))    # (V, K)
        X = lda_fixture["X"]
        expected, N = 0.0, 0
        for d, doc in enumerate(X):
            for v, c in doc:
                expected += c * np.log(theta[d] @ beta[v - 1])
                N += c
        expected /= N
        got = float(
            lda_mod.loglikelihood(model.Xdense, jnp.asarray(theta), jnp.asarray(beta))
        )
        np.testing.assert_allclose(got, expected, rtol=1e-10)


class TestFit:
    def test_fit_converges_on_tiny_corpus(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        ll = model.fit(maxiter=200, tol=1e-6, verbose=False)
        assert len(ll) >= 11
        assert model.converged
        assert np.isfinite(model.elbo)
        assert model.ll == ll[-1]
        # CAVI log-likelihood should improve overall
        assert ll[-1] >= ll[0]

    def test_one_iteration_history(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        ll = model.fit(maxiter=1, verbose=False)
        assert len(ll) == 1


class TestTransform:
    def test_returns_reference_layout(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        model.fit(maxiter=50, verbose=False)
        theta = lda_mod.transform(model, lda_fixture["X"], maxiter=50)
        assert theta.shape == (2, 2)  # (K, D) as in src/LDA.jl:263
        np.testing.assert_allclose(theta.sum(axis=0), np.ones(2), rtol=1e-6)


class TestFitHeldout:
    def test_keeps_topics_fixed(self, lda_fixture):
        model = LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"])
        model.fit(maxiter=50, verbose=False)
        heldout = lda_mod.fit_heldout(lda_fixture["X"], model, maxiter=30)
        np.testing.assert_allclose(heldout.lam, model.lam)
        assert np.isfinite(heldout.ll)
