"""Independent NumPy oracle: every closed-form MMCTM update re-derived as
explicit loops over documents/modalities/topics/terms (from the CAVI math,
not from any implementation) and compared against the batched JAX versions
on random states. Catches batching/axis/indexing errors that tiny
hand-computed fixtures cannot.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import digamma, gammaln

from multimodalmusig_tpu.models import ctm_base, mmctm as mod
from multimodalmusig_tpu.models.mmctm import MMCTM, MMCTMConfig

D, M = 6, 2
K = (3, 2)
V = (7, 5)
MK = sum(K)
OFF = (0, 3)


@pytest.fixture
def setup(rng):
    X = [rng.integers(0, 9, size=(D, V[m])).astype(np.float64) for m in range(M)]
    state = dict(
        lam=rng.normal(size=(D, MK)),
        nu=rng.uniform(0.2, 2.0, size=(D, MK)),
        mu=rng.normal(size=MK),
        gamma=[rng.uniform(0.5, 8.0, size=(K[m], V[m])) for m in range(M)],
        alpha=np.array([0.1, 0.2]),
    )
    A = rng.normal(size=(MK, MK))
    Sigma = np.eye(MK) + 0.1 * A @ A.T / MK
    state["Sigma"] = Sigma
    state["invSigma"] = np.linalg.inv(Sigma)
    return X, state


def make_config():
    return MMCTMConfig(K=K, V=V, D=D, dtype=jnp.float64)


def to_jax_state(X, s, theta=None):
    config = make_config()
    Elnphi = tuple(
        jnp.asarray(digamma(g) - digamma(g.sum(axis=1, keepdims=True)))
        for g in s["gamma"]
    )
    lam = jnp.asarray(s["lam"])
    nu = jnp.asarray(s["nu"])
    state = mod.MMCTMState(
        mu=jnp.asarray(s["mu"]),
        Sigma=jnp.asarray(s["Sigma"]),
        invSigma=jnp.asarray(s["invSigma"]),
        alpha=jnp.asarray(s["alpha"]),
        gamma=tuple(jnp.asarray(g) for g in s["gamma"]),
        Elnphi=Elnphi,
        lam=lam,
        nu=nu,
        zeta=ctm_base.update_zeta(lam, nu, config),
        lam_pre=lam,
        logw_pre=tuple(e.T for e in Elnphi),
    )
    return state, config


def loop_zeta(s):
    zeta = np.zeros((D, M))
    for d in range(D):
        for m in range(M):
            for k in range(K[m]):
                j = OFF[m] + k
                zeta[d, m] += np.exp(s["lam"][d, j] + 0.5 * s["nu"][d, j])
    return zeta


def loop_theta(s):
    """θ[d][m][k, v] ∝ exp(λ_dk + E[ln ϕ_mkv])."""
    out = []
    for m in range(M):
        Eln = digamma(s["gamma"][m]) - digamma(s["gamma"][m].sum(axis=1, keepdims=True))
        th = np.zeros((D, V[m], K[m]))
        for d in range(D):
            for v in range(V[m]):
                for k in range(K[m]):
                    th[d, v, k] = np.exp(s["lam"][d, OFF[m] + k] + Eln[k, v])
                th[d, v] /= th[d, v].sum()
        out.append(th)
    return out


class TestEStepPieces:
    def test_zeta(self, setup):
        X, s = setup
        state, config = to_jax_state(X, s)
        np.testing.assert_allclose(np.asarray(state.zeta), loop_zeta(s), rtol=1e-10)

    def test_theta(self, setup):
        X, s = setup
        state, config = to_jax_state(X, s)
        got = mod.update_theta(state, config)
        expected = loop_theta(s)
        for m in range(M):
            np.testing.assert_allclose(np.asarray(got[m]), expected[m], rtol=1e-8)

    def test_sumtheta(self, setup):
        X, s = setup
        theta = loop_theta(s)
        state, config = to_jax_state(X, s, tuple(jnp.asarray(t) for t in theta))
        got = np.asarray(
            ctm_base.calculate_sumtheta(
                tuple(jnp.asarray(t) for t in theta),
                tuple(jnp.asarray(x) for x in X),
                config,
            )
        )
        expected = np.zeros((D, MK))
        for d in range(D):
            for m in range(M):
                for k in range(K[m]):
                    for v in range(V[m]):
                        expected[d, OFF[m] + k] += X[m][d, v] * theta[m][d, v, k]
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_Ndivzeta(self, setup):
        X, s = setup
        state, config = to_jax_state(X, s)
        N = ctm_base.counts_per_doc(tuple(jnp.asarray(x) for x in X))
        got = np.asarray(ctm_base.calculate_Ndivzeta(N, state.zeta, config))
        zeta = loop_zeta(s)
        expected = np.zeros((D, MK))
        for d in range(D):
            for m in range(M):
                for k in range(K[m]):
                    expected[d, OFF[m] + k] = X[m][d].sum() / zeta[d, m]
        np.testing.assert_allclose(got, expected, rtol=1e-10)


class TestMStepPieces:
    def test_mu_sigma(self, setup):
        X, s = setup
        state, config = to_jax_state(X, s)
        st2 = mod.update_Sigma(mod.update_mu(state), config)
        mu = s["lam"].mean(axis=0)
        Sigma = np.zeros((MK, MK))
        for d in range(D):
            Sigma += np.diag(s["nu"][d])
            diff = s["lam"][d] - mu
            Sigma += np.outer(diff, diff)
        Sigma /= D
        np.testing.assert_allclose(np.asarray(st2.mu), mu, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(st2.Sigma), Sigma, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(st2.invSigma), np.linalg.inv(Sigma), rtol=1e-8)

    def test_gamma(self, setup):
        X, s = setup
        theta = loop_theta(s)
        state, config = to_jax_state(X, s, tuple(jnp.asarray(t) for t in theta))
        st2 = mod.update_gamma(
            state, tuple(jnp.asarray(x) for x in X), config,
            tuple(jnp.asarray(t) for t in theta),
        )
        for m in range(M):
            expected = np.full((K[m], V[m]), s["alpha"][m])
            for d in range(D):
                for v in range(V[m]):
                    for k in range(K[m]):
                        expected[k, v] += X[m][d, v] * theta[m][d, v, k]
            np.testing.assert_allclose(np.asarray(st2.gamma[m]), expected, rtol=1e-10)


class TestMetrics:
    def test_loglikelihoods(self, setup):
        X, s = setup
        state, config = to_jax_state(X, s)
        got = np.asarray(
            mod.modality_loglikelihoods(
                tuple(jnp.asarray(x) for x in X),
                mod.props_from(state.lam, config),
                mod.phi_point(state.gamma),
            )
        )
        for m in range(M):
            ll, N = 0.0, 0.0
            for d in range(D):
                e = np.exp(s["lam"][d, OFF[m] : OFF[m] + K[m]])
                props = e / e.sum()
                phi = s["gamma"][m] / s["gamma"][m].sum(axis=1, keepdims=True)
                for v in range(V[m]):
                    if X[m][d, v] > 0:
                        pw = sum(props[k] * phi[k, v] for k in range(K[m]))
                        ll += X[m][d, v] * np.log(pw)
                        N += X[m][d, v]
            np.testing.assert_allclose(got[m], ll / N, rtol=1e-10)

    def test_elbo(self, setup):
        """Full 7-term ELBO vs an explicit loop re-derivation."""
        X, s = setup
        theta = loop_theta(s)
        state, config = to_jax_state(X, s, tuple(jnp.asarray(t) for t in theta))
        Xj = tuple(jnp.asarray(x) for x in X)
        N = ctm_base.counts_per_doc(Xj)
        got = float(mod.calculate_elbo(state, Xj, N, config))

        zeta = loop_zeta(s)
        invS = s["invSigma"]
        Eln = [
            digamma(s["gamma"][m]) - digamma(s["gamma"][m].sum(axis=1, keepdims=True))
            for m in range(M)
        ]
        Ndoc = [[X[m][d].sum() for m in range(M)] for d in range(D)]

        def logmvbeta(vals):
            return gammaln(vals).sum() - gammaln(vals.sum())

        ElnPphi = 0.0
        for m in range(M):
            for k in range(K[m]):
                ElnPphi -= logmvbeta(np.full(V[m], s["alpha"][m]))
                for v in range(V[m]):
                    ElnPphi += (s["alpha"][m] - 1) * Eln[m][k, v]

        ElnPeta = 0.0
        for d in range(D):
            diff = s["lam"][d] - s["mu"]
            ElnPeta += 0.5 * (
                np.linalg.slogdet(invS)[1]
                - MK * np.log(2 * np.pi)
                - np.trace(np.diag(s["nu"][d]) @ invS)
                - diff @ invS @ diff
            )

        ElnPZ = 0.0
        for d in range(D):
            Eeta = np.exp(s["lam"][d] + 0.5 * s["nu"][d])
            sumtheta = np.zeros(MK)
            Ndivzeta = np.zeros(MK)
            for m in range(M):
                for k in range(K[m]):
                    for v in range(V[m]):
                        sumtheta[OFF[m] + k] += X[m][d, v] * theta[m][d, v, k]
                    Ndivzeta[OFF[m] + k] = Ndoc[d][m] / zeta[d, m]
            ElnPZ += np.sum(s["lam"][d] * sumtheta)
            ElnPZ -= np.sum(Ndivzeta * Eeta) - sum(Ndoc[d])
            ElnPZ -= sum(Ndoc[d][m] * np.log(zeta[d, m]) for m in range(M))

        ElnPX = 0.0
        for d in range(D):
            for m in range(M):
                for v in range(V[m]):
                    for k in range(K[m]):
                        ElnPX += X[m][d, v] * theta[m][d, v, k] * Eln[m][k, v]

        ElnQphi = 0.0
        for m in range(M):
            for k in range(K[m]):
                ElnQphi -= logmvbeta(s["gamma"][m][k])
                for v in range(V[m]):
                    ElnQphi += (s["gamma"][m][k, v] - 1) * Eln[m][k, v]

        ElnQeta = 0.0
        for d in range(D):
            ElnQeta += -0.5 * (np.sum(np.log(s["nu"][d])) + MK * (np.log(2 * np.pi) + 1))

        ElnQZ = 0.0
        for d in range(D):
            for m in range(M):
                for v in range(V[m]):
                    for k in range(K[m]):
                        t = theta[m][d, v, k]
                        if t > 0:
                            ElnQZ += X[m][d, v] * t * np.log(t)

        expected = ElnPphi + ElnPeta + ElnPZ + ElnPX - ElnQphi - ElnQeta - ElnQZ
        np.testing.assert_allclose(got, expected, rtol=1e-8)


class TestIMMCTMOracle:
    """Feature-factorized updates vs explicit 4-level loops on random state."""

    def _setup(self, rng):
        from multimodalmusig_tpu.models.immctm import IMMCTMConfig
        from multimodalmusig_tpu.models.ilda import feature_onehots

        J = ((3, 2), (2, 4))
        features = [
            np.stack([rng.integers(1, j + 1, size=V[m]) for j in J[m]], axis=1)
            for m in range(M)
        ]
        # ensure every value appears so J inference holds
        for m in range(M):
            for i, j in enumerate(J[m]):
                features[m][:j, i] = np.arange(1, j + 1)
        cfg = IMMCTMConfig(K=K, V=V, D=D, dtype=jnp.float64, J=J)
        F = tuple(feature_onehots(features[m], J[m], jnp.float64) for m in range(M))
        gamma = tuple(
            tuple(rng.uniform(0.5, 6.0, size=(K[m], J[m][i])) for i in range(2))
            for m in range(M)
        )
        X = [rng.integers(0, 9, size=(D, V[m])).astype(np.float64) for m in range(M)]
        lam = rng.normal(size=(D, MK))
        return cfg, F, features, gamma, X, lam

    def test_theta_product_of_features(self, rng):
        from multimodalmusig_tpu.models import immctm as imod
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        cfg, F, features, gamma, X, lam = self._setup(rng)
        Elnphi = tuple(
            tuple(dirichlet_expectation(jnp.asarray(g), axis=1) for g in gm)
            for gm in gamma
        )
        state = imod.IMMCTMState(
            mu=jnp.zeros(MK), Sigma=jnp.eye(MK), invSigma=jnp.eye(MK),
            alpha=(jnp.asarray([0.1, 0.1]), jnp.asarray([0.1, 0.1])),
            gamma=tuple(tuple(jnp.asarray(g) for g in gm) for gm in gamma),
            Elnphi=Elnphi,
            lam=jnp.asarray(lam), nu=jnp.ones((D, MK)),
            zeta=jnp.ones((D, M)),
            lam_pre=jnp.asarray(lam),
            logw_pre=tuple(jnp.zeros((V[m], K[m])) for m in range(M)),
        )
        got = imod.update_theta(state, F, cfg)

        for m in range(M):
            Eln = [
                digamma(gamma[m][i]) - digamma(gamma[m][i].sum(axis=1, keepdims=True))
                for i in range(2)
            ]
            for d in range(D):
                for v in range(V[m]):
                    th = np.empty(K[m])
                    for k in range(K[m]):
                        acc = lam[d, OFF[m] + k]
                        for i in range(2):
                            acc += Eln[i][k, features[m][v, i] - 1]
                        th[k] = np.exp(acc)
                    th /= th.sum()
                    np.testing.assert_allclose(
                        np.asarray(got[m][d, v]), th, rtol=1e-8
                    )

    def test_gamma_scatter_per_feature(self, rng):
        from multimodalmusig_tpu.models import immctm as imod
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        cfg, F, features, gamma, X, lam = self._setup(rng)
        theta = [rng.dirichlet(np.ones(K[m]), size=(D, V[m])) for m in range(M)]
        state = imod.IMMCTMState(
            mu=jnp.zeros(MK), Sigma=jnp.eye(MK), invSigma=jnp.eye(MK),
            alpha=(jnp.asarray([0.1, 0.3]), jnp.asarray([0.2, 0.4])),
            gamma=tuple(tuple(jnp.asarray(g) for g in gm) for gm in gamma),
            Elnphi=tuple(
                tuple(dirichlet_expectation(jnp.asarray(g), axis=1) for g in gm)
                for gm in gamma
            ),
            lam=jnp.asarray(lam), nu=jnp.ones((D, MK)),
            zeta=jnp.ones((D, M)),
            lam_pre=jnp.asarray(lam),
            logw_pre=tuple(jnp.zeros((V[m], K[m])) for m in range(M)),
        )
        st2 = imod.update_gamma(
            state, tuple(jnp.asarray(x) for x in X), F, cfg,
            tuple(jnp.asarray(t) for t in theta),
        )
        alphas = [[0.1, 0.3], [0.2, 0.4]]
        for m in range(M):
            for i in range(2):
                expected = np.full((K[m], cfg.J[m][i]), alphas[m][i])
                for d in range(D):
                    for v in range(V[m]):
                        j = features[m][v, i] - 1
                        for k in range(K[m]):
                            expected[k, j] += X[m][d, v] * theta[m][d, v, k]
                np.testing.assert_allclose(
                    np.asarray(st2.gamma[m][i]), expected, rtol=1e-9
                )


class TestLDAOracle:
    """LDA batched updates vs explicit loops on random state (D2, V2 above
    are MMCTM-sized; here plain LDA shapes)."""

    Dl, Vl, Kl = 5, 9, 4

    def _setup(self, rng):
        X = rng.integers(0, 7, size=(self.Dl, self.Vl)).astype(np.float64)
        lam = rng.uniform(0.5, 9.0, size=(self.Vl, self.Kl))
        gamma = rng.uniform(0.5, 9.0, size=(self.Dl, self.Kl))
        phi = rng.dirichlet(np.ones(self.Kl), size=(self.Dl, self.Vl))
        return X, lam, gamma, phi

    def test_updates_and_elbo(self, rng):
        from multimodalmusig_tpu.models import lda as lmod
        from multimodalmusig_tpu.models.lda import LDAConfig, LDAState
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        X, lam, gamma, phi = self._setup(rng)
        alpha, eta = 0.1, 0.2
        cfg = LDAConfig(K=self.Kl, V=self.Vl, D=self.Dl, alpha=alpha, eta=eta,
                        dtype=jnp.float64)
        state = LDAState(
            lam=jnp.asarray(lam),
            Elnbeta=dirichlet_expectation(jnp.asarray(lam), axis=0),
            gamma=jnp.asarray(gamma),
            Elntheta=dirichlet_expectation(jnp.asarray(gamma), axis=1),
            Elntheta_pre=jnp.zeros_like(jnp.asarray(gamma)),
            logw_pre=jnp.zeros_like(jnp.asarray(lam)),
        )

        # γ update: α + Σ_v X[d,v] φ[d,v,k]
        st2 = lmod.update_gamma(state, jnp.asarray(X), cfg, jnp.asarray(phi))
        for d in range(self.Dl):
            for k in range(self.Kl):
                expected = alpha + sum(
                    X[d, v] * phi[d, v, k] for v in range(self.Vl)
                )
                np.testing.assert_allclose(float(st2.gamma[d, k]), expected, rtol=1e-10)

        # λ update: η + Σ_d X[d,v] φ[d,v,k]
        st3 = lmod.update_lambda(state, jnp.asarray(X), cfg, jnp.asarray(phi))
        for v in range(self.Vl):
            for k in range(self.Kl):
                expected = eta + sum(
                    X[d, v] * phi[d, v, k] for d in range(self.Dl)
                )
                np.testing.assert_allclose(float(st3.lam[v, k]), expected, rtol=1e-10)

        # ELBO vs loop re-derivation (incl. the reference's unweighted,
        # presence-masked ElnQZ — src/LDA.jl:160-166)
        got = float(lmod.calculate_elbo(state, jnp.asarray(X), cfg, jnp.asarray(phi)))
        Elnb = digamma(lam) - digamma(lam.sum(axis=0, keepdims=True))
        Elnt = digamma(gamma) - digamma(gamma.sum(axis=1, keepdims=True))
        K_, V_, D_ = self.Kl, self.Vl, self.Dl
        ElnPb = K_ * (gammaln(V_ * eta) - V_ * gammaln(eta)) + (eta - 1) * Elnb.sum()
        ElnPt = D_ * (gammaln(K_ * alpha) - K_ * gammaln(alpha)) + (alpha - 1) * Elnt.sum()
        ElnPZ = sum(
            phi[d, v, k] * Elnt[d, k] * X[d, v]
            for d in range(D_) for v in range(V_) for k in range(K_)
        )
        ElnPX = sum(
            phi[d, v, k] * Elnb[v, k] * X[d, v]
            for d in range(D_) for v in range(V_) for k in range(K_)
        )
        ElnQb = gammaln(lam).sum() - gammaln(lam.sum(axis=0)).sum() - ((lam - 1) * Elnb).sum()
        ElnQt = gammaln(gamma).sum() - gammaln(gamma.sum(axis=1)).sum() - ((gamma - 1) * Elnt).sum()
        ElnQZ = sum(
            phi[d, v, k] * np.log(phi[d, v, k])
            for d in range(D_) for v in range(V_) for k in range(K_)
            if X[d, v] > 0
        )
        expected = ElnPb + ElnPt + ElnPZ + ElnPX - ElnQb - ElnQt - ElnQZ
        np.testing.assert_allclose(got, expected, rtol=1e-8)


class TestILDAOracle:
    """ILDA feature-factorized updates vs explicit loops on random state."""

    def test_phi_and_lambda(self, rng):
        from multimodalmusig_tpu.models import ilda as imod
        from multimodalmusig_tpu.models.ilda import ILDAConfig, ILDAState, feature_onehots
        from multimodalmusig_tpu.ops.special import dirichlet_expectation

        Dl, Vl, Kl = 4, 8, 3
        J = (3, 4)
        features = np.stack(
            [rng.integers(1, j + 1, size=Vl) for j in J], axis=1
        )
        for i, j in enumerate(J):
            features[:j, i] = np.arange(1, j + 1)
        cfg = ILDAConfig(K=Kl, V=Vl, D=Dl, J=J, alpha=0.1, eta=(0.1, 0.2),
                         dtype=jnp.float64)
        F = feature_onehots(features, J, jnp.float64)
        lam = tuple(rng.uniform(0.5, 6.0, size=(J[i], Kl)) for i in range(2))
        gamma = rng.uniform(0.5, 6.0, size=(Dl, Kl))
        state = ILDAState(
            lam=tuple(jnp.asarray(l) for l in lam),
            Elnbeta=tuple(dirichlet_expectation(jnp.asarray(l), axis=0) for l in lam),
            gamma=jnp.asarray(gamma),
            Elntheta=dirichlet_expectation(jnp.asarray(gamma), axis=1),
            Elntheta_pre=jnp.zeros((Dl, Kl)),
            logw_pre=jnp.zeros((Vl, Kl)),
        )

        # ϕ update: softmax over k of Elnθ + Σ_i Elnβ_i[j_v]
        st = imod.update_phi(state, F)
        got_phi = np.asarray(imod.reconstruct_phi(st))
        Elnb = [digamma(lam[i]) - digamma(lam[i].sum(axis=0, keepdims=True)) for i in range(2)]
        Elnt = digamma(gamma) - digamma(gamma.sum(axis=1, keepdims=True))
        for d in range(Dl):
            for v in range(Vl):
                logits = np.array([
                    Elnt[d, k] + sum(Elnb[i][features[v, i] - 1, k] for i in range(2))
                    for k in range(Kl)
                ])
                e = np.exp(logits - logits.max())
                np.testing.assert_allclose(got_phi[d, v], e / e.sum(), rtol=1e-8)

        # λ update: per-feature scatter of X·ϕ
        X = rng.integers(0, 7, size=(Dl, Vl)).astype(np.float64)
        phi = rng.dirichlet(np.ones(Kl), size=(Dl, Vl))
        st2 = imod.update_lambda(state, jnp.asarray(X), F, cfg, jnp.asarray(phi))
        for i in range(2):
            expected = np.full((J[i], Kl), cfg.eta[i])
            for d in range(Dl):
                for v in range(Vl):
                    j = features[v, i] - 1
                    for k in range(Kl):
                        expected[j, k] += X[d, v] * phi[d, v, k]
            np.testing.assert_allclose(np.asarray(st2.lam[i]), expected, rtol=1e-9)
