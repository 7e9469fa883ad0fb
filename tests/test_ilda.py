"""ILDA tests, porting the reference's hand-computed fixtures (test/ilda.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import digamma as sp_digamma

from multimodalmusig_tpu.models import ilda as mod
from multimodalmusig_tpu.models.ilda import ILDA

FEATURES = np.array([[1, 1], [1, 2], [2, 1], [2, 2]])
X = [np.array([[1, 5], [2, 8]]), np.array([[3, 2], [4, 5]])]
K, ALPHA, ETA = 2, 0.1, 0.1


@pytest.fixture
def model():
    return ILDA(K, ALPHA, ETA, FEATURES, X)


class TestConstructor:
    # test/ilda.jl:24-50
    def test_shapes_and_invariants(self, model):
        assert model.K == 2
        assert model.D == 2
        assert model.I == 2
        assert model.J == [2, 2]
        assert model.eta == [ETA, ETA]
        assert len(model.lam) == 2
        assert model.lam[0].shape == (2, 2)
        assert model.lam[1].shape == (2, 2)
        assert np.all(model.lam[0] > 0) and np.all(model.lam[1] > 0)
        assert len(model.Elnbeta) == 2
        assert model.Elnbeta[0].shape == (2, 2)
        assert model.alpha == ALPHA
        assert model.gamma.shape == (2, 2)
        assert np.all(model.gamma > 0)
        assert model.Elntheta.shape == (2, 2)
        np.testing.assert_allclose(model.phi[0].sum(axis=0), np.ones(2), rtol=1e-6)

    def test_vector_eta(self):
        model = ILDA(K, ALPHA, [0.01, 0.5], FEATURES, X)
        assert model.eta == [0.01, 0.5]


class TestUpdatePhi:
    # test/ilda.jl:52-99
    def test_hand_computed(self, model):
        Elntheta_ref = np.array([[0.5, -1.1], [2.3, -0.7]])  # (K, D)
        Elnbeta = [
            np.array([[-0.2, -0.9], [-1.1, 0.3]]),
            np.array([[0.5, 0.1], [-0.1, -0.4]]),
        ]
        model.state = model.state._replace(
            Elntheta=jnp.asarray(Elntheta_ref.T),
            Elnbeta=tuple(jnp.asarray(e) for e in Elnbeta),
        )
        model.state = mod.update_phi(model.state, model.F)

        # doc 1: terms v=1,2 -> features (1,1), (1,2)
        phi = np.empty((2, 2))
        phi[0, 0] = np.exp(Elntheta_ref[0, 0] + Elnbeta[0][0, 0] + Elnbeta[1][0, 0])
        phi[0, 1] = np.exp(Elntheta_ref[0, 0] + Elnbeta[0][0, 0] + Elnbeta[1][1, 0])
        phi[1, 0] = np.exp(Elntheta_ref[1, 0] + Elnbeta[0][0, 1] + Elnbeta[1][0, 1])
        phi[1, 1] = np.exp(Elntheta_ref[1, 0] + Elnbeta[0][0, 1] + Elnbeta[1][1, 1])
        phi /= phi.sum(axis=0, keepdims=True)
        np.testing.assert_allclose(model.phi[0], phi, rtol=1e-10)

        # doc 2: terms v=3,4 -> features (2,1), (2,2)
        phi[0, 0] = np.exp(Elntheta_ref[0, 1] + Elnbeta[0][1, 0] + Elnbeta[1][0, 0])
        phi[0, 1] = np.exp(Elntheta_ref[0, 1] + Elnbeta[0][1, 0] + Elnbeta[1][1, 0])
        phi[1, 0] = np.exp(Elntheta_ref[1, 1] + Elnbeta[0][1, 1] + Elnbeta[1][0, 1])
        phi[1, 1] = np.exp(Elntheta_ref[1, 1] + Elnbeta[0][1, 1] + Elnbeta[1][1, 1])
        phi /= phi.sum(axis=0, keepdims=True)
        np.testing.assert_allclose(model.phi[1], phi, rtol=1e-10)


class TestUpdateGamma:
    # test/ilda.jl:101-121
    def test_hand_computed(self, model):
        phi_doc1 = np.array([[0.4, 0.2], [0.6, 0.8]])  # (K, W)
        gamma = np.empty(2)
        gamma[0] = ALPHA + phi_doc1[0, 0] * X[0][0, 1] + phi_doc1[0, 1] * X[0][1, 1]
        gamma[1] = ALPHA + phi_doc1[1, 0] * X[0][0, 1] + phi_doc1[1, 1] * X[0][1, 1]
        Elntheta = sp_digamma(gamma) - sp_digamma(gamma.sum())

        dense_phi = np.array(mod.reconstruct_phi(model.state))
        dense_phi[0, 0:2, :] = phi_doc1.T
        model.state = mod.update_gamma(
            model.state, model.Xdense, model.config, jnp.asarray(dense_phi)
        )
        np.testing.assert_allclose(model.gamma[:, 0], gamma, rtol=1e-10)
        np.testing.assert_allclose(model.Elntheta[:, 0], Elntheta, rtol=1e-10)


class TestUpdateLambda:
    # test/ilda.jl:123-158
    def test_hand_computed(self):
        eta_test = [0.1, 0.2]
        model = ILDA(K, ALPHA, eta_test, FEATURES, X)
        phi = [np.array([[0.4, 0.2], [0.6, 0.8]]), np.array([[0.1, 0.6], [0.9, 0.4]])]
        dense_phi = np.zeros((2, 4, 2))
        dense_phi[0, 0:2, :] = phi[0].T  # doc 1 terms 1,2
        dense_phi[1, 2:4, :] = phi[1].T  # doc 2 terms 3,4
        model.state = mod.update_lambda(
            model.state, model.Xdense, model.F, model.config, jnp.asarray(dense_phi)
        )

        # feature 1: term 1,2 -> j=1; term 3,4 -> j=2
        lam = np.empty((2, 2))
        lam[0, 0] = eta_test[0] + phi[0][0, 0] * X[0][0, 1] + phi[0][0, 1] * X[0][1, 1]
        lam[1, 0] = eta_test[0] + phi[1][0, 0] * X[1][0, 1] + phi[1][0, 1] * X[1][1, 1]
        lam[0, 1] = eta_test[0] + phi[0][1, 0] * X[0][0, 1] + phi[0][1, 1] * X[0][1, 1]
        lam[1, 1] = eta_test[0] + phi[1][1, 0] * X[1][0, 1] + phi[1][1, 1] * X[1][1, 1]
        Elnbeta = sp_digamma(lam) - sp_digamma(lam.sum(axis=0, keepdims=True))
        np.testing.assert_allclose(model.lam[0], lam, rtol=1e-10)
        np.testing.assert_allclose(model.Elnbeta[0], Elnbeta, rtol=1e-10)

        # feature 2: terms 1,3 -> j=1; terms 2,4 -> j=2
        lam[0, 0] = eta_test[1] + phi[0][0, 0] * X[0][0, 1] + phi[1][0, 0] * X[1][0, 1]
        lam[1, 0] = eta_test[1] + phi[0][0, 1] * X[0][1, 1] + phi[1][0, 1] * X[1][1, 1]
        lam[0, 1] = eta_test[1] + phi[0][1, 0] * X[0][0, 1] + phi[1][1, 0] * X[1][0, 1]
        lam[1, 1] = eta_test[1] + phi[0][1, 1] * X[0][1, 1] + phi[1][1, 1] * X[1][1, 1]
        Elnbeta = sp_digamma(lam) - sp_digamma(lam.sum(axis=0, keepdims=True))
        np.testing.assert_allclose(model.lam[1], lam, rtol=1e-10)
        np.testing.assert_allclose(model.Elnbeta[1], Elnbeta, rtol=1e-10)


class TestElbo:
    # test/ilda.jl:160-173
    def test_negative_on_fresh_model(self, model):
        elbo = float(mod.calculate_elbo(model.state, model.Xdense, model.F, model.config))
        assert np.isfinite(elbo)
        assert elbo < 0.0


class TestLoglikelihood:
    def test_matches_hand_mixture(self, model):
        theta = np.asarray(mod.theta_point(model.state))
        beta = [np.asarray(b) for b in mod.beta_point(model.state)]
        expected, N = 0.0, 0
        for d, doc in enumerate(X):
            for v, c in doc:
                pw = 0.0
                for k in range(K):
                    tmp = theta[d, k]
                    for i in range(2):
                        tmp *= beta[i][FEATURES[v - 1, i] - 1, k]
                    pw += tmp
                expected += c * np.log(pw)
                N += c
        expected /= N
        got = float(
            mod.loglikelihood(
                model.Xdense, jnp.asarray(theta), mod.beta_point(model.state), model.F
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-8)


class TestFitTransformHeldout:
    def test_fit_converges(self, model):
        ll = model.fit(maxiter=200, tol=1e-6, verbose=False)
        assert model.converged
        assert np.isfinite(model.elbo)
        assert ll[-1] >= ll[0]

    def test_transform_fixed(self, model):
        # the reference's ILDA transform is dead code (src/ILDA.jl:293);
        # ours must work
        model.fit(maxiter=50, verbose=False)
        theta = mod.transform(model, X, maxiter=50)
        assert theta.shape == (2, 2)
        np.testing.assert_allclose(theta.sum(axis=0), np.ones(2), rtol=1e-6)

    def test_fit_heldout(self, model):
        model.fit(maxiter=50, verbose=False)
        heldout = mod.fit_heldout(X, model, maxiter=30)
        for i in range(2):
            np.testing.assert_allclose(heldout.lam[i], model.lam[i])
        assert np.isfinite(heldout.ll)
