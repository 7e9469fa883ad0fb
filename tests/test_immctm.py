"""IMMCTM tests, porting the reference's hand-computed fixtures (test/immctm.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import digamma as sp_digamma

from multimodalmusig_tpu.models import immctm as mod
from multimodalmusig_tpu.models.immctm import IMMCTM

K = [2, 3]
ALPHA = [0.1, 0.1]
FEATURES = [
    np.array([[1, 1], [1, 2], [2, 1], [2, 2]]),
    np.array([[1, 1], [1, 2], [2, 1], [2, 2]]),
]
X = [
    [np.array([[1, 5], [2, 8]]), np.array([[1, 2], [2, 5]])],
    [np.array([[3, 4], [4, 9]]), np.array([[3, 4], [4, 6]])],
]


@pytest.fixture
def model():
    return IMMCTM(K, ALPHA, FEATURES, X)


class TestConstructor:
    # test/immctm.jl:53-77
    def test_shapes_and_invariants(self, model):
        assert model.D == 2
        assert model.N == [[13, 7], [13, 10]]
        assert model.M == 2
        assert model.I == [2, 2]
        assert model.J == [[2, 2], [2, 2]]
        assert model.V == [4, 4]
        assert model.mu.shape == (5,)
        assert model.Sigma.shape == (5, 5)
        assert model.invSigma.shape == (5, 5)
        assert len(model.zeta) == 2 and len(model.zeta[0]) == 2
        np.testing.assert_allclose(model.theta[0][0].sum(axis=0), np.ones(2), rtol=1e-6)
        assert model.lam[0].shape == (5,)
        np.testing.assert_array_equal(model.nu[0], np.ones(5))
        gamma = model.gamma
        assert len(gamma) == 2
        assert len(gamma[0]) == 2         # K_1 topics
        assert len(gamma[0][0]) == 2      # I_1 features
        assert gamma[0][0][0].shape == (2,)  # J_11 values
        assert np.all(gamma[0][0][0] > 0)

    def test_scalar_alpha_broadcast(self, model):
        # src/IMMCTM.jl:80-88
        assert model.alpha == [[0.1, 0.1], [0.1, 0.1]]


class TestUpdateTheta:
    # test/immctm.jl:181-222
    def test_hand_computed(self, model):
        lam = jnp.asarray([[1.0, 2, 3, 4, 1], [2.0, 3, 1, 4, 2]])
        gamma_ref = [
            [  # modality 1: [k][i] -> vector over j
                [[0.1, 0.2], [0.1, 1.0]],
                [[0.1, 0.1], [1.0, 1.0]],
            ],
            [  # modality 2
                [[0.5, 0.5], [1.0, 1.5]],
                [[1.0, 2.0], [2.0, 3.0]],
                [[1.0, 5.0], [5.0, 2.0]],
            ],
        ]
        # ours: [m][i] -> (K_m, J_mi)
        gamma = tuple(
            tuple(
                jnp.asarray(np.array([gamma_ref[m][k][i] for k in range(K[m])]))
                for i in range(2)
            )
            for m in range(2)
        )
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        state = model.state._replace(
            lam=lam,
            gamma=gamma,
            Elnphi=tuple(
                tuple(dirichlet_expectation(g, axis=1) for g in gm) for gm in gamma
            ),
        )
        theta = mod.update_theta(state, model.F, model.config)

        # doc 1, modality 1, terms v=1,2 (features (1,1) and (1,2))
        th = np.empty((2, 2))
        th[0, 0] = np.exp(1 + sp_digamma(0.1) - sp_digamma(0.3) + sp_digamma(0.1) - sp_digamma(1.1))
        th[1, 0] = np.exp(2 + sp_digamma(0.1) - sp_digamma(0.2) + sp_digamma(1.0) - sp_digamma(2.0))
        th[0, 1] = np.exp(1 + sp_digamma(0.1) - sp_digamma(0.3) + sp_digamma(1.0) - sp_digamma(1.1))
        th[1, 1] = np.exp(2 + sp_digamma(0.1) - sp_digamma(0.2) + sp_digamma(1.0) - sp_digamma(2.0))
        th /= th.sum(axis=0, keepdims=True)
        got = np.asarray(theta[0][0, 0:2, :]).T
        np.testing.assert_allclose(got, th, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(theta[0]).sum(axis=-1), np.ones((2, 4)), rtol=1e-6)

        # doc 2, modality 2, terms v=3,4 (features (2,1) and (2,2))
        th = np.empty((3, 2))
        th[0, 0] = np.exp(1 + sp_digamma(0.5) - sp_digamma(1.0) + sp_digamma(1.0) - sp_digamma(2.5))
        th[1, 0] = np.exp(4 + sp_digamma(2.0) - sp_digamma(3.0) + sp_digamma(2.0) - sp_digamma(5.0))
        th[2, 0] = np.exp(2 + sp_digamma(5.0) - sp_digamma(6.0) + sp_digamma(5.0) - sp_digamma(7.0))
        th[0, 1] = np.exp(1 + sp_digamma(0.5) - sp_digamma(1.0) + sp_digamma(1.5) - sp_digamma(2.5))
        th[1, 1] = np.exp(4 + sp_digamma(2.0) - sp_digamma(3.0) + sp_digamma(3.0) - sp_digamma(5.0))
        th[2, 1] = np.exp(2 + sp_digamma(5.0) - sp_digamma(6.0) + sp_digamma(2.0) - sp_digamma(7.0))
        th /= th.sum(axis=0, keepdims=True)
        got = np.asarray(theta[1][1, 2:4, :]).T
        np.testing.assert_allclose(got, th, rtol=1e-8)


class TestUpdateGamma:
    # test/immctm.jl:251-261
    def test_hand_computed(self, model):
        theta = [np.zeros((2, 4, 2)), np.zeros((2, 4, 3))]
        theta[0][0, 0:2, :] = np.array([[0.4, 0.1], [0.6, 0.9]]).T
        theta[0][1, 2:4, :] = np.array([[0.3, 0.5], [0.7, 0.5]]).T
        state = mod.update_gamma(
            model.state, model.Xdense, model.F, model.config,
            tuple(jnp.asarray(t) for t in theta),
        )

        # modality 1, topic 1: feature 1 (j from term block), feature 2 (j from parity)
        g1 = [0.1 + 5 * 0.4 + 8 * 0.1, 0.1 + 4 * 0.3 + 9 * 0.5]
        g2 = [0.1 + 5 * 0.4 + 4 * 0.3, 0.1 + 8 * 0.1 + 9 * 0.5]
        got = np.asarray(state.gamma[0][0])  # feature 1, (K, J)
        np.testing.assert_allclose(got[0], g1, rtol=1e-10)
        got = np.asarray(state.gamma[0][1])  # feature 2
        np.testing.assert_allclose(got[0], g2, rtol=1e-10)

    def test_Elnphi(self, model):
        # test/immctm.jl:263-271
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        g = np.array(model.state.gamma[0][0])
        g[0] = [1.0, 2.0]
        Eln = dirichlet_expectation(jnp.asarray(g), axis=1)
        np.testing.assert_allclose(float(Eln[0, 0]), sp_digamma(1) - sp_digamma(3), rtol=1e-8)


class TestUpdateAlpha:
    # test/immctm.jl:274-294
    def test_improves_objective_and_changes(self, model):
        from multimodalmusig_tpu.ops.solvers import alpha_objective

        state = model.state
        S = float(np.asarray(state.Elnphi[1][1]).sum())  # modality 2, feature 2
        before = float(alpha_objective(jnp.float64(0.1), S, K[1], 2))
        state2 = mod.update_alpha(state, model.config)
        after = float(alpha_objective(jnp.float64(state2.alpha[1][1]), S, K[1], 2))
        assert after > before
        assert not np.allclose(np.asarray(state2.alpha[0]), 0.1)
        assert not np.allclose(np.asarray(state2.alpha[1]), 0.1)


class TestElbo:
    # test/immctm.jl:338-341
    def test_negative_on_fresh_model(self, model):
        N = mod.counts_per_doc(model.Xdense)
        elbo = float(mod.calculate_elbo(model.state, model.Xdense, N, model.F, model.config))
        assert np.isfinite(elbo)
        assert elbo < 0.0


class TestLoglikelihoods:
    # test/immctm.jl:350-386
    def test_hand_computed(self, model):
        eta = np.array([[1.0, 2.0], [2.0, 3.0]])
        props = np.exp(eta) / np.exp(eta).sum(axis=1, keepdims=True)
        gamma_ref = [
            [[0.1, 0.2], [0.1, 1.0]],
            [[0.1, 0.1], [1.0, 1.0]],
        ]
        phi = [
            [np.asarray(g) / np.sum(g) for g in gamma_ref[k]] for k in range(2)
        ]
        F1 = FEATURES[0]

        sum_ll, N = 0.0, 0
        for d in range(2):
            for v, c in X[d][0]:
                pw = 0.0
                for k in range(2):
                    tmp = props[d][k]
                    for i in range(2):
                        tmp *= phi[k][i][F1[v - 1, i] - 1]
                    pw += tmp
                sum_ll += c * np.log(pw)
                N += c
        expected = sum_ll / N

        # install λ giving these props and γ giving these ϕ, then call ours
        lam = np.zeros((2, 5))
        lam[:, 0:2] = eta
        gamma_m1 = tuple(
            jnp.asarray(np.array([gamma_ref[k][i] for k in range(2)])) for i in range(2)
        )
        gamma = (gamma_m1, model.state.gamma[1])
        got = float(
            mod.modality_loglikelihoods(
                model.Xdense, jnp.asarray(lam), gamma, model.F, model.config
            )[0]
        )
        np.testing.assert_allclose(got, expected, rtol=1e-8)


class TestFit:
    # test/immctm.jl:343-348
    def test_one_iteration_history(self, model):
        ll = model.fit(maxiter=1, verbose=False)
        assert len(ll) == 1
        assert len(ll[0]) == 2

    def test_converges_smoke(self, model):
        ll = model.fit(maxiter=60, verbose=False)
        assert np.all(np.isfinite(np.asarray(ll)))
        assert np.isfinite(model.elbo)

    def test_estep_no_nans(self, model):
        N = mod.counts_per_doc(model.Xdense)
        lam0 = np.array(model.state.lam)
        state, theta = mod.e_step(model.state, model.Xdense, N, model.F, model.config)
        assert np.all(np.isfinite(np.asarray(state.lam)))
        assert not np.allclose(np.asarray(state.lam), lam0)
        assert np.all(np.asarray(state.nu) > 0)


class TestHeldoutTransformPredict:
    def test_fit_heldout(self, model):
        model.fit(maxiter=5, verbose=False)
        heldout = mod.fit_heldout(X, model, maxiter=5)
        for m in range(2):
            for i in range(2):
                np.testing.assert_allclose(
                    np.asarray(heldout.state.gamma[m][i]),
                    np.asarray(model.state.gamma[m][i]),
                )
        assert np.all(np.isfinite(heldout.ll))

    def test_transform_extension(self, model):
        model.fit(maxiter=5, verbose=False)
        new = mod.transform(model, X, maxiter=5)
        np.testing.assert_array_equal(new.Sigma, model.Sigma)
        assert np.all(np.isfinite(new.ll))

    def test_predict_modality_eta(self, model):
        model.fit(maxiter=5, verbose=False)
        Xobs = [[doc[1]] for doc in X]
        eta = mod.predict_modality_eta(Xobs, 1, model, maxiter=5)
        assert len(eta) == 2
        assert eta[0].shape == (2,)
        assert np.all(np.isfinite(eta[0]))


class TestTransformWeightSemantics:
    def test_transform_uses_frozen_point_phi(self, model):
        """IMMCTM transform must use Σ_i ln(point ϕ) weights (the MMCTM
        unsmoothed-θ analogue), not the smoothed Σ_i E[ln ϕ]."""
        model.fit(maxiter=3, verbose=False)
        new = mod.transform(model, X, maxiter=1)
        expected = mod.unsmoothed_logw(
            mod.phi_point(model.state.gamma), model.F, model.config
        )
        for m in range(2):
            np.testing.assert_allclose(
                np.asarray(new.state.logw_pre[m]),
                np.asarray(expected[m]),
                rtol=1e-6,
            )
