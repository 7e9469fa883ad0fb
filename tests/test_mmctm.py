"""MMCTM tests, porting the reference's hand-computed fixtures (test/mmctm.jl)."""

import jax.numpy as jnp
import numpy as np
from scipy.special import digamma as sp_digamma

from multimodalmusig_tpu.models import mmctm as mod
from multimodalmusig_tpu.models.mmctm import MMCTM


def make_model(mmctm_fixture, **kw):
    return MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"], **kw)


class TestConstructor:
    # test/mmctm.jl:35-57
    def test_shapes_and_invariants(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        assert model.D == 2
        assert model.N == [[13, 7], [13, 10]]
        assert model.M == 2
        assert model.V == [4, 4]
        assert model.mu.shape == (5,)
        assert model.Sigma.shape == (5, 5)
        assert model.invSigma.shape == (5, 5)
        assert len(model.zeta) == 2 and len(model.zeta[0]) == 2
        theta = model.theta
        np.testing.assert_allclose(theta[0][0].sum(axis=0), np.ones(2), rtol=1e-6)
        assert model.lam[0].shape == (5,)
        np.testing.assert_array_equal(model.nu[0], np.ones(5))
        gamma = model.gamma
        assert len(gamma) == 2 and len(gamma[0]) == 2
        assert gamma[0][0].shape == (4,) and gamma[0][1].shape == (4,)
        assert np.all(gamma[0][1] > 0)

    def test_document_init(self, mmctm_fixture):
        model = make_model(mmctm_fixture, init="document")
        # every topic seeded: gamma > 1 somewhere per topic, base 1 elsewhere
        for m in range(2):
            g = np.asarray(model.state.gamma[m])
            assert np.all(g >= 1.0)
            assert np.all(g.max(axis=1) > 1.0)

    def test_unicode_aliases(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        np.testing.assert_array_equal(model.μ, model.mu)
        np.testing.assert_array_equal(model.Σ, model.Sigma)
        assert model.α == model.alpha


class TestNdivZeta:
    # test/mmctm.jl:59-73
    def test_hand_computed(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        zeta = jnp.asarray([[2.0, 3.0], [4.0, 5.0]])
        N = mod.counts_per_doc(model.Xdense)
        got = np.asarray(mod.calculate_Ndivzeta(N, zeta, model.config))
        expected_doc1 = [13 / 2, 13 / 2, 7 / 3, 7 / 3, 7 / 3]
        np.testing.assert_allclose(got[0], expected_doc1, rtol=1e-12)


class TestSumTheta:
    # test/mmctm.jl:75-96
    def test_hand_computed(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        X = mmctm_fixture["X"]
        th1 = np.array([[0.4, 0.1], [0.6, 0.9]])
        th2 = np.array([[0.3, 0.4], [0.3, 0.5], [0.4, 0.1]])

        theta = [np.zeros((2, 4, 2)), np.zeros((2, 4, 3))]
        theta[0][0, 0:2, :] = th1.T  # doc 1, modality 1 present terms 1,2
        theta[1][0, 0:2, :] = th2.T  # doc 1, modality 2 present terms 1,2
        got = np.asarray(
            mod.calculate_sumtheta(
                tuple(jnp.asarray(t) for t in theta), model.Xdense, model.config
            )
        )
        expected = [
            5 * th1[0, 0] + 8 * th1[0, 1],
            5 * th1[1, 0] + 8 * th1[1, 1],
            2 * th2[0, 0] + 5 * th2[0, 1],
            2 * th2[1, 0] + 5 * th2[1, 1],
            2 * th2[2, 0] + 5 * th2[2, 1],
        ]
        np.testing.assert_allclose(got[0], expected, rtol=1e-12)


class TestUpdateZeta:
    # test/mmctm.jl:177-186
    def test_hand_computed(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        lam = jnp.asarray([[1.0, 2, 3, 4, 1], [2.0, 3, 1, 4, 2]])
        nu = jnp.asarray([[1.0, 1, 1, 2, 1], [1.0, 3, 1, 2, 1]])
        state = model.state._replace(lam=lam, nu=nu)
        got = np.asarray(mod.update_zeta(state, model.config))
        expected = [np.exp(1.5) + np.exp(2.5), np.exp(3.5) + np.exp(5) + np.exp(1.5)]
        np.testing.assert_allclose(got[0], expected, rtol=1e-10)


class TestUpdateTheta:
    # test/mmctm.jl:188-232
    def test_hand_computed(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        lam = jnp.asarray([[1.0, 2, 3, 4, 1], [2.0, 3, 1, 4, 2]])
        gamma = (
            jnp.asarray([[1.0, 2, 2, 6], [2.0, 3, 1, 2]]),
            jnp.asarray([[1.0, 2, 3, 4], [2.0, 1, 2, 6], [1.0, 1, 3, 1]]),
        )
        state = model.state._replace(
            lam=lam,
            gamma=gamma,
            Elnphi=tuple(
                jnp.asarray(sp_digamma(np.asarray(g)) - sp_digamma(np.asarray(g).sum(1, keepdims=True)))
                for g in gamma
            ),
        )
        theta = mod.update_theta(state, model.config)

        # doc 1, modality 1, present terms v=1,2
        th = np.empty((2, 2))
        th[0, 0] = np.exp(1 + sp_digamma(1) - sp_digamma(11))
        th[1, 0] = np.exp(2 + sp_digamma(2) - sp_digamma(8))
        th[0, 1] = np.exp(1 + sp_digamma(2) - sp_digamma(11))
        th[1, 1] = np.exp(2 + sp_digamma(3) - sp_digamma(8))
        th /= th.sum(axis=0, keepdims=True)
        got = np.asarray(theta[0][0, 0:2, :]).T  # (K, W)
        np.testing.assert_allclose(got, th, rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(theta[0]).sum(axis=-1), np.ones((2, 4)), rtol=1e-6
        )

        # doc 2, modality 2, present terms v=3,4
        th = np.empty((3, 2))
        th[0, 0] = np.exp(1 + sp_digamma(3) - sp_digamma(10))
        th[1, 0] = np.exp(4 + sp_digamma(2) - sp_digamma(11))
        th[2, 0] = np.exp(2 + sp_digamma(3) - sp_digamma(6))
        th[0, 1] = np.exp(1 + sp_digamma(4) - sp_digamma(10))
        th[1, 1] = np.exp(4 + sp_digamma(6) - sp_digamma(11))
        th[2, 1] = np.exp(2 + sp_digamma(1) - sp_digamma(6))
        th /= th.sum(axis=0, keepdims=True)
        got = np.asarray(theta[1][1, 2:4, :]).T
        np.testing.assert_allclose(got, th, rtol=1e-8)


class TestUpdateMuSigma:
    # test/mmctm.jl:234-259
    def test_mu(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        lam = jnp.asarray([[1.0, 2, 3, 4, 1], [2.0, 3, 1, 4, 2]])
        state = mod.update_mu(model.state._replace(lam=lam))
        np.testing.assert_allclose(np.asarray(state.mu), [1.5, 2.5, 2.0, 4.0, 1.5])

    def test_sigma(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        lam = np.array([[1.0, 2, 3, 4, 1], [2.0, 3, 1, 4, 2]])
        nu = np.array([[1.0, 1, 1, 2, 1], [1.0, 3, 1, 2, 1]])
        mu = np.array([1.0, 1, 2, 2, 1])
        state = model.state._replace(
            lam=jnp.asarray(lam), nu=jnp.asarray(nu), mu=jnp.asarray(mu)
        )
        state = mod.update_Sigma(state, model.config)
        d1, d2 = lam[0] - mu, lam[1] - mu
        Sigma = 0.5 * (np.diag(nu[0]) + np.diag(nu[1]) + np.outer(d1, d1) + np.outer(d2, d2))
        np.testing.assert_allclose(np.asarray(state.Sigma), Sigma, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(state.invSigma), np.linalg.inv(Sigma), rtol=1e-8)


class TestUpdateGamma:
    # test/mmctm.jl:261-287
    def test_hand_computed(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        theta = [np.zeros((2, 4, 2)), np.zeros((2, 4, 3))]
        theta[0][0, 0:2, :] = np.array([[0.4, 0.1], [0.6, 0.9]]).T
        theta[0][1, 2:4, :] = np.array([[0.3, 0.5], [0.7, 0.5]]).T
        theta[1][0, 0:2, :] = np.array([[0.2, 0.6], [0.7, 0.3], [0.1, 0.1]]).T
        theta[1][1, 2:4, :] = np.array([[0.1, 0.3], [0.7, 0.5], [0.2, 0.2]]).T
        state = mod.update_gamma(
            model.state, model.Xdense, model.config,
            tuple(jnp.asarray(t) for t in theta),
        )

        g = np.asarray(state.gamma[0])
        np.testing.assert_allclose(
            g[0], [0.1 + 5 * 0.4, 0.1 + 8 * 0.1, 0.1 + 4 * 0.3, 0.1 + 9 * 0.5], rtol=1e-10
        )
        np.testing.assert_allclose(
            g[1], [0.1 + 5 * 0.6, 0.1 + 8 * 0.9, 0.1 + 4 * 0.7, 0.1 + 9 * 0.5], rtol=1e-10
        )
        g = np.asarray(state.gamma[1])
        np.testing.assert_allclose(
            g[0], [0.1 + 2 * 0.2, 0.1 + 5 * 0.6, 0.1 + 4 * 0.1, 0.1 + 6 * 0.3], rtol=1e-10
        )
        np.testing.assert_allclose(
            g[1], [0.1 + 2 * 0.7, 0.1 + 5 * 0.3, 0.1 + 4 * 0.7, 0.1 + 6 * 0.5], rtol=1e-10
        )
        np.testing.assert_allclose(
            g[2], [0.1 + 2 * 0.1, 0.1 + 5 * 0.1, 0.1 + 4 * 0.2, 0.1 + 6 * 0.2], rtol=1e-10
        )

    def test_Elnphi(self, mmctm_fixture):
        # test/mmctm.jl:289-296
        model = make_model(mmctm_fixture)
        gamma = list(model.state.gamma)
        g0 = np.array(gamma[0])
        g0[0] = [1, 2, 1, 3]
        state = model.state._replace(gamma=(jnp.asarray(g0), gamma[1]))
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        Eln = dirichlet_expectation(state.gamma[0], axis=1)
        np.testing.assert_allclose(
            float(Eln[0, 0]), sp_digamma(1) - sp_digamma(7), rtol=1e-8
        )


class TestSolverSmoke:
    # test/mmctm.jl:98-109 (update_λ! changes λ, no NaNs)
    # and test/mmctm.jl:160-175 (update_ν! stays positive)
    def test_estep_no_nans(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        lam0 = np.array(model.state.lam)
        N = mod.counts_per_doc(model.Xdense)
        state, theta = mod.e_step(model.state, model.Xdense, N, model.config)
        lam = np.asarray(state.lam)
        nu = np.asarray(state.nu)
        assert np.all(np.isfinite(lam))
        assert not np.allclose(lam, lam0)
        assert np.all(nu > 0)


class TestUpdateAlpha:
    # test/mmctm.jl:298-327
    def test_improves_objective(self, mmctm_fixture):
        from multimodalmusig_tpu.ops.solvers import alpha_objective

        model = make_model(mmctm_fixture)
        state = model.state
        before = []
        for m in range(2):
            S = float(np.asarray(state.Elnphi[m]).sum())
            before.append(float(alpha_objective(jnp.float64(state.alpha[m]), S, 2 if m == 0 else 3, 4)))
        state2 = mod.update_alpha(state, model.config)
        assert not np.allclose(np.asarray(state2.alpha), np.asarray(state.alpha))
        for m in range(2):
            S = float(np.asarray(state.Elnphi[m]).sum())
            after = float(alpha_objective(jnp.float64(state2.alpha[m]), S, 2 if m == 0 else 3, 4))
            assert after > before[m]


class TestElbo:
    # test/mmctm.jl:377-380
    def test_nonpositive_on_fresh_model(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        N = mod.counts_per_doc(model.Xdense)
        elbo = float(mod.calculate_elbo(model.state, model.Xdense, N, model.config))
        assert np.isfinite(elbo)
        assert elbo <= 0.0


class TestLoglikelihoods:
    # test/mmctm.jl:389-427
    def test_hand_computed(self, mmctm_fixture):
        X = mmctm_fixture["X"]
        eta = [np.array([1.0, 2.0]), np.array([2.0, 3.0])]
        props = np.stack([np.exp(e) / np.exp(e).sum() for e in eta])  # (D, K)
        gamma = np.array([[1.0, 2, 1, 3], [1.0, 1, 2, 4]])
        phi = gamma / gamma.sum(axis=1, keepdims=True)  # (K, V)

        sum_ll = [
            X[0][0][0, 1] * np.log(props[0] @ phi[:, 0])
            + X[0][0][1, 1] * np.log(props[0] @ phi[:, 1]),
            X[1][0][0, 1] * np.log(props[1] @ phi[:, 2])
            + X[1][0][1, 1] * np.log(props[1] @ phi[:, 3]),
        ]
        N = [13.0, 13.0]

        model = make_model(mmctm_fixture)
        Xm1 = model.Xdense[0]
        got_doc = float(
            mod.doc_modality_loglikelihood(Xm1[0], jnp.asarray(props[0]), jnp.asarray(phi))
        )
        np.testing.assert_allclose(got_doc, sum_ll[0] / N[0], rtol=1e-10)

        got = float(
            mod.modality_loglikelihoods([Xm1], [jnp.asarray(props)], [jnp.asarray(phi)])[0]
        )
        np.testing.assert_allclose(got, sum(sum_ll) / sum(N), rtol=1e-10)


class TestFit:
    # test/mmctm.jl:382-387
    def test_one_iteration_history(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        ll = model.fit(maxiter=1, verbose=False)
        assert len(ll) == 1
        assert len(ll[0]) == 2

    def test_converges_on_tiny_corpus(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        ll = model.fit(maxiter=100, tol=1e-4, verbose=False)
        assert model.converged
        assert np.isfinite(model.elbo)
        assert np.all(np.isfinite(np.asarray(ll)))
        # fitted proportions normalize
        props = model.props
        np.testing.assert_allclose(sum(props[0][0]), 1.0, rtol=1e-6)

    def test_autoalpha_julia_spelling(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        ll = model.fit(maxiter=2, verbose=False, **{"autoα": True, "updateΣ": False})
        assert len(ll) == 2
        assert model.alpha != [0.1, 0.1]


class TestTransform:
    # test/mmctm.jl:429-444
    def test_sigma_preserved_iff_not_fit_gaussian(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        model.fit(maxiter=1, verbose=False)

        newmodel = mod.transform(model, mmctm_fixture["X"], maxiter=1, fit_gaussian=False)
        assert len(newmodel.ll) == 2
        np.testing.assert_array_equal(newmodel.Sigma, model.Sigma)

        newmodel = mod.transform(model, mmctm_fixture["X"], maxiter=1, fit_gaussian=True)
        assert np.any(newmodel.Sigma != model.Sigma)


class TestFitHeldout:
    def test_keeps_topics_fixed(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        model.fit(maxiter=5, verbose=False)
        heldout = mod.fit_heldout(mmctm_fixture["X"], model, maxiter=5)
        for m in range(2):
            np.testing.assert_allclose(
                np.asarray(heldout.state.gamma[m]), np.asarray(model.state.gamma[m])
            )
        assert np.all(np.isfinite(heldout.ll))


class TestPredictModalityEta:
    def test_shapes_and_finite(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        model.fit(maxiter=5, verbose=False)
        Xobs = [[doc[1]] for doc in mmctm_fixture["X"]]  # only modality 2 observed
        eta = mod.predict_modality_eta(Xobs, 1, model, maxiter=5)
        assert len(eta) == 2
        assert eta[0].shape == (2,)  # K[0]
        assert np.all(np.isfinite(eta[0]))

    def test_linear_conditioning_formula(self, mmctm_fixture):
        model = make_model(mmctm_fixture)
        model.fit(maxiter=5, verbose=False)
        Xobs = [[doc[0]] for doc in mmctm_fixture["X"]]  # modality 1 observed
        eta = mod.predict_modality_eta(Xobs, 2, model, maxiter=3)
        assert eta[0].shape == (3,)  # K[1]


class TestCTM:
    def test_single_modality(self, lda_fixture):
        from multimodalmusig_tpu.models.mmctm import CTM

        X = [[doc] for doc in lda_fixture["X"]]
        model = CTM(2, 0.1, X)
        assert model.M == 1
        ll = model.fit(maxiter=15, verbose=False)
        assert np.all(np.isfinite(np.asarray(ll)))


class TestTransformWeightSemantics:
    def test_transform_uses_frozen_point_phi(self, mmctm_fixture):
        """The transform E-step must weight θ by ln(point ϕ), not by the
        smoothed E[ln ϕ] (src/MMCTM.jl:496-509 unsmoothed_update_θ!)."""
        model = make_model(mmctm_fixture)
        model.fit(maxiter=3, verbose=False)
        new = mod.transform(model, mmctm_fixture["X"], maxiter=1)
        phi = mod.phi_point(model.state.gamma)
        for m in range(2):
            np.testing.assert_allclose(
                np.asarray(new.state.logw_pre[m]),
                np.log(np.asarray(phi[m])).T,
                rtol=1e-6,
            )


class TestSpdInverse:
    """Both spd_inverse schedules (models/ctm_base.py): the unrolled
    static-shape Cholesky inverse for n <= 20 (the mutation-signature sizes)
    and the cho_factor/cho_solve fallback above it, which the MK=24
    budget-robustness workload exercises (tools/budget_robustness.py)."""

    def _spd(self, rng, n, batch=()):
        A = rng.standard_normal(batch + (n, n))
        S = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
        return S

    def test_unrolled_matches_numpy(self):
        from multimodalmusig_tpu.models.ctm_base import spd_inverse

        rng = np.random.default_rng(0)
        S = self._spd(rng, 14)
        out = np.asarray(spd_inverse(jnp.asarray(S)))
        np.testing.assert_allclose(out, np.linalg.inv(S), rtol=1e-9, atol=1e-12)

    def test_fallback_matches_numpy(self):
        from multimodalmusig_tpu.models.ctm_base import spd_inverse

        rng = np.random.default_rng(1)
        S = self._spd(rng, 24)
        out = np.asarray(spd_inverse(jnp.asarray(S)))
        np.testing.assert_allclose(out, np.linalg.inv(S), rtol=1e-9, atol=1e-12)

    def test_both_schedules_accept_batch_dims(self):
        # The M-step calls spd_inverse per restart lane; leading batch axes
        # must work on BOTH schedules (the fallback once built eye from
        # shape[0] — the batch axis — instead of shape[-1]).
        from multimodalmusig_tpu.models.ctm_base import spd_inverse

        rng = np.random.default_rng(2)
        for n in (14, 24):
            S = self._spd(rng, n, batch=(3,))
            out = np.asarray(spd_inverse(jnp.asarray(S)))
            np.testing.assert_allclose(out, np.linalg.inv(S), rtol=1e-9, atol=1e-12)
