"""Independent full-trajectory MMCTM CAVI oracle (NumPy/SciPy only).

A literal per-document implementation of the reference's fit! loop
(src/MMCTM.jl:457-494): for every iteration, for every document,
ζ (closed form) → θ (per-token softmax) → ν (per-coordinate scalar root
find via scipy brentq, machine precision) → λ (damped Newton with exact
dense Hessian solves, gradient to ~1e-12) — then the μ/Σ/γ M-step and the
per-modality normalized log-likelihood and 7-term ELBO.

This is ground truth for trajectory-level parity tests: the inner
optimization problems are smooth and strictly concave, so solving them to
machine precision on both sides makes the CAVI trajectory a property of the
MATH, not of either implementation (the reference's NLopt LD_MMA at
xtol 1e-4 sits within this tolerance band of the exact solves it
approximates). Written from the model equations (src/common.jl:11-36,
src/MMCTM.jl:110-382) without consulting the JAX implementation's code
paths — see tests/test_trajectory_oracle.py for the comparisons.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize
from scipy.special import digamma, gammaln

NU_LOWER_BOUND = 1e-7


def _offsets(K):
    out, acc = [], 0
    for k in K:
        out.append(acc)
        acc += k
    return out


def solve_nu_exact(nu0, lam, Ndivzeta, invSigma_diag):
    """Per-coordinate exact maximization of the ν objective
    (src/common.jl:25-36): stationarity 1/(2ν) − a − (b/2)e^{ν/2} = 0 with
    a = Σ⁻¹ᵢᵢ/2, b = Ndivζᵢ·e^{λᵢ}, solved by brentq to machine precision.
    b = 0 (empty doc×modality) gives the closed form ν = 1/(2a)."""
    MK = len(nu0)
    out = np.empty(MK)
    for i in range(MK):
        a = 0.5 * invSigma_diag[i]
        b = Ndivzeta[i] * np.exp(lam[i])
        if b == 0.0:
            out[i] = max(1.0 / (2.0 * a), NU_LOWER_BOUND)
            continue

        def f(nu, a=a, b=b):
            return 0.5 / nu - a - 0.5 * b * np.exp(0.5 * nu)

        hi = 1.0 / (2.0 * a)  # f(hi) = −(b/2)e^{hi/2} < 0
        lo = min(1e-12, hi * 0.5)
        out[i] = max(
            scipy.optimize.brentq(f, lo, hi, xtol=1e-15, rtol=8.9e-16, maxiter=200),
            NU_LOWER_BOUND,
        )
    return out


def solve_lambda_exact(lam0, nu, Ndivzeta, sumtheta, mu, invSigma, gtol=1e-12):
    """Damped Newton maximization of the λ objective (src/common.jl:11-23):
    ∇ = −Σ⁻¹(λ−μ) + sumθ − w, H = −(Σ⁻¹ + diag(w)), w = Ndivζ·e^{λ+ν/2}.
    Strictly concave ⇒ Newton with backtracking converges globally."""
    lam = lam0.astype(np.float64).copy()

    def value(l):
        diff = l - mu
        return (
            -0.5 * diff @ invSigma @ diff
            + l @ sumtheta
            - np.sum(Ndivzeta * np.exp(l + 0.5 * nu))
        )

    f = value(lam)
    for _ in range(200):
        w = Ndivzeta * np.exp(lam + 0.5 * nu)
        g = -(invSigma @ (lam - mu)) + sumtheta - w
        if np.max(np.abs(g)) < gtol:
            break
        H = invSigma + np.diag(w)
        delta = np.linalg.solve(H, g)
        s = 1.0
        for _ in range(60):
            cand = lam + s * delta
            fc = value(cand)
            if np.isfinite(fc) and fc >= f:
                lam, f = cand, fc
                break
            s *= 0.5
        else:
            break  # no improving step at 2^-60: already at float resolution
    return lam


def oracle_init(X, K, alpha, gamma):
    """Initial state matching the reference's (src/MMCTM.jl:29-91): given γ
    (the only random piece), μ=0, Σ=invΣ=I, λ=0, ν=1, ζ consistent."""
    M = len(K)
    MK = sum(K)
    D = X[0].shape[0]
    off = _offsets(K)
    lam = np.zeros((D, MK))
    nu = np.ones((D, MK))
    zeta = np.empty((D, M))
    e = np.exp(lam + 0.5 * nu)
    for m in range(M):
        zeta[:, m] = e[:, off[m]: off[m] + K[m]].sum(axis=1)
    return dict(
        mu=np.zeros(MK),
        Sigma=np.eye(MK),
        invSigma=np.eye(MK),
        alpha=np.asarray(alpha, np.float64),
        gamma=[np.asarray(g, np.float64).copy() for g in gamma],
        lam=lam,
        nu=nu,
        zeta=zeta,
    )


def _Eln(gamma):
    return [digamma(g) - digamma(g.sum(axis=1, keepdims=True)) for g in gamma]


def _theta_doc(lam_d, Eln, K, off):
    """θ[m][v, k] ∝ exp(λ_dk + E[ln ϕ_mkv]), per modality, for one doc."""
    out = []
    for m in range(len(K)):
        logits = lam_d[off[m]: off[m] + K[m]][None, :] + Eln[m].T  # (V_m, K_m)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        out.append(e / e.sum(axis=1, keepdims=True))
    return out


def oracle_loglikelihoods(X, lam, gamma, K, off):
    """(M,) per-modality normalized mixture ll (src/MMCTM.jl:384-448)."""
    M = len(K)
    D = X[0].shape[0]
    out = np.empty(M)
    for m in range(M):
        phi = gamma[m] / gamma[m].sum(axis=1, keepdims=True)  # (K_m, V_m)
        ll, N = 0.0, 0.0
        for d in range(D):
            lb = lam[d, off[m]: off[m] + K[m]]
            e = np.exp(lb - lb.max())
            props = e / e.sum()
            P = props @ phi
            mask = X[m][d] > 0
            ll += np.sum(X[m][d][mask] * np.log(P[mask]))
            N += X[m][d].sum()
        out[m] = ll / N
    return out


def oracle_elbo(state, theta, X, K, off):
    """7-term ELBO (src/MMCTM.jl:271-382) from explicit loops."""
    M = len(K)
    MK = sum(K)
    D = X[0].shape[0]
    s = state
    Eln = _Eln(s["gamma"])
    N = np.array([[X[m][d].sum() for m in range(M)] for d in range(D)])

    def logmvbeta(vals):
        return gammaln(vals).sum() - gammaln(vals.sum())

    ElnPphi = 0.0
    for m in range(M):
        for k in range(K[m]):
            ElnPphi -= logmvbeta(np.full(X[m].shape[1], s["alpha"][m]))
            ElnPphi += (s["alpha"][m] - 1.0) * Eln[m][k].sum()

    invS = s["invSigma"]
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
        for m in range(M):
            blk = slice(off[m], off[m] + K[m])
            sumth = X[m][d] @ theta[d][m]  # (K_m,)
            ElnPZ += s["lam"][d, blk] @ sumth
            ElnPZ -= (N[d, m] / s["zeta"][d, m]) * Eeta[blk].sum() - N[d, m]
            ElnPZ -= N[d, m] * np.log(s["zeta"][d, m])

    ElnPX = 0.0
    for d in range(D):
        for m in range(M):
            ElnPX += np.einsum("v,vk,kv->", X[m][d], theta[d][m], Eln[m])

    ElnQphi = 0.0
    for m in range(M):
        for k in range(K[m]):
            ElnQphi -= logmvbeta(s["gamma"][m][k])
            ElnQphi += (s["gamma"][m][k] - 1.0) @ Eln[m][k]

    ElnQeta = 0.0
    for d in range(D):
        ElnQeta -= 0.5 * (np.sum(np.log(s["nu"][d])) + MK * (np.log(2 * np.pi) + 1.0))

    ElnQZ = 0.0
    for d in range(D):
        for m in range(M):
            t = theta[d][m]
            ElnQZ += np.sum(X[m][d][:, None] * np.where(t > 0, t * np.log(np.where(t > 0, t, 1.0)), 0.0))

    terms = dict(
        ElnPphi=ElnPphi, ElnPeta=ElnPeta, ElnPZ=ElnPZ, ElnPX=ElnPX,
        ElnQphi=ElnQphi, ElnQeta=ElnQeta, ElnQZ=ElnQZ,
    )
    elbo = ElnPphi + ElnPeta + ElnPZ + ElnPX - ElnQphi - ElnQeta - ElnQZ
    return elbo, terms


def solve_alpha_exact(sum_Elnphi, K, V):
    """Exact symmetric-Dirichlet hyperparameter MLE (src/common.jl:38-46):
    root of g(α) = K·V·(ψ(Vα) − ψ(α)) + ΣElnϕ, concave objective, by brentq."""

    def g(a):
        return K * V * (digamma(V * a) - digamma(a)) + sum_Elnphi

    lo = 1e-10
    hi = 1.0
    while g(hi) > 0 and hi < 1e12:
        hi *= 4.0
    if g(hi) > 0:
        return hi
    return max(
        scipy.optimize.brentq(g, lo, hi, xtol=1e-15, rtol=8.9e-16, maxiter=300),
        1e-7,
    )


def oracle_fit_immctm(X, K, features, alpha, gamma_init, n_iters,
                      autoalpha=False):
    """Independent per-document IMMCTM CAVI trajectory: the feature-factorized
    model (src/IMMCTM.jl:430-466) with per-feature Dirichlets γ[m][i] and
    θ logits summing per-feature digamma expectations (src/IMMCTM.jl:152-172).
    Inner λ/ν solves at machine precision as in oracle_fit. Returns
    (state, ll_history, elbo_history, theta)."""
    M = len(K)
    MK = sum(K)
    D = X[0].shape[0]
    off = _offsets(K)
    I = [features[m].shape[1] for m in range(M)]
    J = [[int(features[m][:, i].max()) for i in range(I[m])] for m in range(M)]

    s = dict(
        mu=np.zeros(MK),
        Sigma=np.eye(MK),
        invSigma=np.eye(MK),
        alpha=[np.asarray(am, np.float64).copy() for am in alpha],
        gamma=[[np.asarray(g, np.float64).copy() for g in gm] for gm in gamma_init],
        lam=np.zeros((D, MK)),
        nu=np.ones((D, MK)),
        zeta=np.ones((D, M)),
    )
    N = np.array([[X[m][d].sum() for m in range(M)] for d in range(D)])

    def Eln_all():
        return [
            [digamma(g) - digamma(g.sum(axis=1, keepdims=True)) for g in gm]
            for gm in s["gamma"]
        ]

    def logw_m(Eln, m):
        """(V_m, K_m): Σ_i Elnϕ_m,i[k, features[v,i]-1]."""
        V = X[m].shape[1]
        out = np.zeros((V, K[m]))
        for v in range(V):
            for i in range(I[m]):
                out[v] += Eln[m][i][:, features[m][v, i] - 1]
        return out

    def theta_all(Eln):
        th = []
        for d in range(D):
            row = []
            for m in range(M):
                logits = s["lam"][d, off[m]: off[m] + K[m]][None, :] + logw_m(Eln, m)
                e = np.exp(logits - logits.max(axis=1, keepdims=True))
                row.append(e / e.sum(axis=1, keepdims=True))
            th.append(row)
        return th

    def loglikelihoods():
        out = np.empty(M)
        for m in range(M):
            phi = [g / g.sum(axis=1, keepdims=True) for g in s["gamma"][m]]
            V = X[m].shape[1]
            B = np.ones((K[m], V))
            for v in range(V):
                for i in range(I[m]):
                    B[:, v] *= phi[i][:, features[m][v, i] - 1]
            ll, Ntot = 0.0, 0.0
            for d in range(D):
                lb = s["lam"][d, off[m]: off[m] + K[m]]
                e = np.exp(lb - lb.max())
                P = (e / e.sum()) @ B
                mask = X[m][d] > 0
                ll += np.sum(X[m][d][mask] * np.log(P[mask]))
                Ntot += X[m][d].sum()
            out[m] = ll / Ntot
        return out

    def elbo(theta):
        Eln = Eln_all()

        def logmvbeta(vals):
            return gammaln(vals).sum() - gammaln(vals.sum())

        ElnPphi = 0.0
        ElnQphi = 0.0
        for m in range(M):
            for i in range(I[m]):
                for k in range(K[m]):
                    ElnPphi -= logmvbeta(np.full(J[m][i], s["alpha"][m][i]))
                    ElnPphi += (s["alpha"][m][i] - 1.0) * Eln[m][i][k].sum()
                    ElnQphi -= logmvbeta(s["gamma"][m][i][k])
                    ElnQphi += (s["gamma"][m][i][k] - 1.0) @ Eln[m][i][k]

        invS = s["invSigma"]
        ElnPeta = sum(
            0.5 * (
                np.linalg.slogdet(invS)[1]
                - MK * np.log(2 * np.pi)
                - np.trace(np.diag(s["nu"][d]) @ invS)
                - (s["lam"][d] - s["mu"]) @ invS @ (s["lam"][d] - s["mu"])
            )
            for d in range(D)
        )

        ElnPZ = 0.0
        for d in range(D):
            Eeta = np.exp(s["lam"][d] + 0.5 * s["nu"][d])
            for m in range(M):
                blk = slice(off[m], off[m] + K[m])
                ElnPZ += s["lam"][d, blk] @ (X[m][d] @ theta[d][m])
                ElnPZ -= (N[d, m] / s["zeta"][d, m]) * Eeta[blk].sum() - N[d, m]
                ElnPZ -= N[d, m] * np.log(s["zeta"][d, m])

        ElnPX = 0.0
        for d in range(D):
            for m in range(M):
                lw = logw_m(Eln, m)  # (V, K)
                ElnPX += np.sum(X[m][d][:, None] * theta[d][m] * lw)

        ElnQeta = sum(
            -0.5 * (np.sum(np.log(s["nu"][d])) + MK * (np.log(2 * np.pi) + 1.0))
            for d in range(D)
        )

        ElnQZ = 0.0
        for d in range(D):
            for m in range(M):
                t = theta[d][m]
                ElnQZ += np.sum(
                    X[m][d][:, None]
                    * np.where(t > 0, t * np.log(np.where(t > 0, t, 1.0)), 0.0)
                )

        return ElnPphi + ElnPeta + ElnPZ + ElnPX - ElnQphi - ElnQeta - ElnQZ

    ll_hist = np.empty((n_iters, M))
    elbo_hist = np.empty(n_iters)
    theta = None
    for it in range(n_iters):
        Eln = Eln_all()
        theta = theta_all(Eln)
        for d in range(D):
            e = np.exp(s["lam"][d] + 0.5 * s["nu"][d])
            for m in range(M):
                s["zeta"][d, m] = e[off[m]: off[m] + K[m]].sum()
            # θ above used pre-ζ-update state λ; recompute θ_d AFTER ζ like
            # the batched e_step (θ depends only on λ/Elnϕ, so order is moot)
            Ndivzeta = np.empty(MK)
            sumtheta = np.empty(MK)
            for m in range(M):
                blk = slice(off[m], off[m] + K[m])
                Ndivzeta[blk] = N[d, m] / s["zeta"][d, m]
                sumtheta[blk] = X[m][d] @ theta[d][m]
            s["nu"][d] = solve_nu_exact(
                s["nu"][d], s["lam"][d], Ndivzeta, np.diag(s["invSigma"])
            )
            s["lam"][d] = solve_lambda_exact(
                s["lam"][d], s["nu"][d], Ndivzeta, sumtheta, s["mu"], s["invSigma"]
            )

        s["mu"] = s["lam"].mean(axis=0)
        E = s["lam"] - s["mu"]
        s["Sigma"] = (np.diag(s["nu"].sum(axis=0)) + E.T @ E) / D
        s["invSigma"] = np.linalg.inv(s["Sigma"])
        for m in range(M):
            W = np.zeros((K[m], X[m].shape[1]))
            for d in range(D):
                W += (X[m][d][:, None] * theta[d][m]).T
            for i in range(I[m]):
                g = np.full((K[m], J[m][i]), s["alpha"][m][i])
                for v in range(X[m].shape[1]):
                    g[:, features[m][v, i] - 1] += W[:, v]
                s["gamma"][m][i] = g

        if autoalpha:
            Eln_new = Eln_all()
            for m in range(M):
                for i in range(I[m]):
                    s["alpha"][m][i] = solve_alpha_exact(
                        Eln_new[m][i].sum(), K[m], J[m][i]
                    )

        ll_hist[it] = loglikelihoods()
        elbo_hist[it] = elbo(theta)

    return s, ll_hist, elbo_hist, theta


def oracle_fit(X, K, alpha, gamma_init, n_iters, update_sigma=True,
               autoalpha=False):
    """Run n_iters reference-structured CAVI iterations; returns
    (state, ll_history (n_iters, M), elbo_history (n_iters,), theta)."""
    M = len(K)
    MK = sum(K)
    D = X[0].shape[0]
    off = _offsets(K)
    s = oracle_init(X, K, alpha, gamma_init)
    N = np.array([[X[m][d].sum() for m in range(M)] for d in range(D)])

    ll_hist = np.empty((n_iters, M))
    elbo_hist = np.empty(n_iters)
    theta = None
    for it in range(n_iters):
        Eln = _Eln(s["gamma"])
        theta = []
        # E-step: per document ζ → θ → ν → λ (src/MMCTM.jl:450-455)
        for d in range(D):
            e = np.exp(s["lam"][d] + 0.5 * s["nu"][d])
            for m in range(M):
                s["zeta"][d, m] = e[off[m]: off[m] + K[m]].sum()
            th = _theta_doc(s["lam"][d], Eln, K, off)
            theta.append(th)
            Ndivzeta = np.empty(MK)
            sumtheta = np.empty(MK)
            for m in range(M):
                blk = slice(off[m], off[m] + K[m])
                Ndivzeta[blk] = N[d, m] / s["zeta"][d, m]
                sumtheta[blk] = X[m][d] @ th[m]
            s["nu"][d] = solve_nu_exact(
                s["nu"][d], s["lam"][d], Ndivzeta, np.diag(s["invSigma"])
            )
            s["lam"][d] = solve_lambda_exact(
                s["lam"][d], s["nu"][d], Ndivzeta, sumtheta, s["mu"], s["invSigma"]
            )

        # M-step (src/MMCTM.jl:200-242)
        s["mu"] = s["lam"].mean(axis=0)
        if update_sigma:
            E = s["lam"] - s["mu"]
            s["Sigma"] = (np.diag(s["nu"].sum(axis=0)) + E.T @ E) / D
            s["invSigma"] = np.linalg.inv(s["Sigma"])
        for m in range(M):
            g = np.full_like(s["gamma"][m], s["alpha"][m])
            for d in range(D):
                g += (X[m][d][:, None] * theta[d][m]).T
            s["gamma"][m] = g

        if autoalpha:
            # per-modality MLE from the refreshed E[ln ϕ] (src/MMCTM.jl:252-269)
            Eln_new = _Eln(s["gamma"])
            for m in range(M):
                s["alpha"][m] = solve_alpha_exact(
                    Eln_new[m].sum(), K[m], X[m].shape[1]
                )

        ll_hist[it] = oracle_loglikelihoods(X, s["lam"], s["gamma"], K, off)
        # ELBO of the current state with this iteration's θ (the reference
        # computes it from the last fitdoc!'s θ, src/MMCTM.jl:490)
        elbo_hist[it], _ = oracle_elbo(s, theta, X, K, off)

    return s, ll_hist, elbo_hist, theta


# ---------------------------------------------------------------------------
# Inference-path oracles (transform / fit_heldout / predict_modality_eta):
# literal per-document loops with machine-precision inner solves, mirroring
# src/MMCTM.jl:511-552 (transform), :554-586 (fit_heldout) and :588-634
# (predict_modality_η). These paths carry the most documented divergences
# (frozen-ϕ likelihood, sliced-full-inverse conditioning), so they get the
# same independent end-to-end verification as fit.
# ---------------------------------------------------------------------------


def _phi_point(gamma):
    return [g / g.sum(axis=1, keepdims=True) for g in gamma]


def _theta_doc_logw(lam_d, logw, K, off):
    """θ[m][v, k] ∝ exp(λ_dk + logw_m[v, k]) for arbitrary log-weights."""
    out = []
    for m in range(len(K)):
        logits = lam_d[off[m]: off[m] + K[m]][None, :] + logw[m]
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        out.append(e / e.sum(axis=1, keepdims=True))
    return out


def _estep_sweep(s, X, K, off, logw):
    """One E-step over all docs: ζ → θ (given log-weights) → ν → λ
    (src/MMCTM.jl:450-455 without the M-step). Returns θ."""
    M = len(K)
    MK = sum(K)
    D = X[0].shape[0]
    N = np.array([[X[m][d].sum() for m in range(M)] for d in range(D)])
    theta = []
    for d in range(D):
        e = np.exp(s["lam"][d] + 0.5 * s["nu"][d])
        for m in range(M):
            s["zeta"][d, m] = e[off[m]: off[m] + K[m]].sum()
        th = _theta_doc_logw(s["lam"][d], logw, K, off)
        theta.append(th)
        Ndivzeta = np.empty(MK)
        sumtheta = np.empty(MK)
        for m in range(M):
            blk = slice(off[m], off[m] + K[m])
            Ndivzeta[blk] = N[d, m] / s["zeta"][d, m]
            sumtheta[blk] = X[m][d] @ th[m]
        s["nu"][d] = solve_nu_exact(
            s["nu"][d], s["lam"][d], Ndivzeta, np.diag(s["invSigma"])
        )
        s["lam"][d] = solve_lambda_exact(
            s["lam"][d], s["nu"][d], Ndivzeta, sumtheta, s["mu"], s["invSigma"]
        )
    return theta


def _fresh_docside(Xnew, K):
    M = len(K)
    MK = sum(K)
    D = Xnew[0].shape[0]
    off = _offsets(K)
    lam = np.zeros((D, MK))
    nu = np.ones((D, MK))
    zeta = np.empty((D, M))
    e = np.exp(lam + 0.5 * nu)
    for m in range(M):
        zeta[:, m] = e[:, off[m]: off[m] + K[m]].sum(axis=1)
    return lam, nu, zeta


def oracle_transform(Xnew, trained, K, n_iters, fit_gaussian=False):
    """Fold-in of new documents against the trained point estimate ϕ
    (src/MMCTM.jl:511-552): fresh doc-side state, θ from unsmoothed log ϕ
    (not E[ln ϕ]); μ/Σ frozen from the trained model unless fit_gaussian.
    Returns (state, ll_history (n_iters, M))."""
    M = len(K)
    MK = sum(K)
    off = _offsets(K)
    D = Xnew[0].shape[0]
    lam, nu, zeta = _fresh_docside(Xnew, K)
    # μ/Σ copy from the trained model ONLY when not fit_gaussian
    # (src/MMCTM.jl:515-520); with fit_gaussian the sub-model keeps its
    # fresh init (μ=0, Σ=I) and refits them every iteration.
    if fit_gaussian:
        mu, Sigma, invSigma = np.zeros(MK), np.eye(MK), np.eye(MK)
    else:
        mu = trained["mu"].copy()
        Sigma = trained["Sigma"].copy()
        invSigma = np.linalg.inv(trained["Sigma"])
    s = dict(
        mu=mu, Sigma=Sigma, invSigma=invSigma,
        gamma=[g.copy() for g in trained["gamma"]],
        lam=lam, nu=nu, zeta=zeta,
    )
    phi = _phi_point(trained["gamma"])
    logw = [
        np.where(p.T > 0, np.log(np.where(p.T > 0, p.T, 1.0)), -np.inf)
        for p in phi
    ]  # (V_m, K_m)
    ll_hist = np.empty((n_iters, M))
    for it in range(n_iters):
        _estep_sweep(s, Xnew, K, off, logw)
        if fit_gaussian:
            s["mu"] = s["lam"].mean(axis=0)
            E = s["lam"] - s["mu"]
            s["Sigma"] = (np.diag(s["nu"].sum(axis=0)) + E.T @ E) / D
            s["invSigma"] = np.linalg.inv(s["Sigma"])
        ll_hist[it] = oracle_loglikelihoods(Xnew, s["lam"], trained["gamma"], K, off)
    return s, ll_hist


def oracle_fit_heldout(Xh, trained, K, n_iters):
    """Doc-side-only refit with the full copied global posterior and
    SMOOTHED θ updates via the trained E[ln ϕ] (src/MMCTM.jl:554-586).
    Returns (state, ll_history)."""
    M = len(K)
    off = _offsets(K)
    lam, nu, zeta = _fresh_docside(Xh, K)
    s = dict(
        mu=trained["mu"].copy(),
        Sigma=trained["Sigma"].copy(),
        invSigma=trained["invSigma"].copy(),
        gamma=[g.copy() for g in trained["gamma"]],
        lam=lam, nu=nu, zeta=zeta,
    )
    Eln = _Eln(trained["gamma"])
    logw = [e.T for e in Eln]  # (V_m, K_m)
    ll_hist = np.empty((n_iters, M))
    for it in range(n_iters):
        _estep_sweep(s, Xh, K, off, logw)
        ll_hist[it] = oracle_loglikelihoods(Xh, s["lam"], trained["gamma"], K, off)
    return s, ll_hist


def oracle_predict_eta(Xobs, m, trained, K, n_iters):
    """Cross-modality imputation (src/MMCTM.jl:588-634): fit the observed
    modalities' document posteriors doc-side only (smoothed θ, sub-model
    globals SLICED from the full model — including invΣ_oo as the [obs,obs]
    block of the FULL inverse, the reference's estimator), then
    η = μ_u + Σ_uo · invΣ_oo · (λ_d − μ_o). `m` is 0-based here.
    Returns (eta (D, K[m]), obs_state, ll_history)."""
    MK = sum(K)
    off = _offsets(K)
    unobs = np.arange(off[m], off[m] + K[m])
    obs = np.setdiff1d(np.arange(MK), unobs)
    obsM = [i for i in range(len(K)) if i != m]
    K_obs = [K[i] for i in obsM]
    off_obs = _offsets(K_obs)

    lam, nu, zeta = _fresh_docside(Xobs, K_obs)
    s = dict(
        mu=trained["mu"][obs].copy(),
        Sigma=trained["Sigma"][np.ix_(obs, obs)].copy(),
        invSigma=trained["invSigma"][np.ix_(obs, obs)].copy(),
        gamma=[trained["gamma"][i].copy() for i in obsM],
        lam=lam, nu=nu, zeta=zeta,
    )
    Eln = _Eln(s["gamma"])
    logw = [e.T for e in Eln]
    ll_hist = np.empty((n_iters, len(K_obs)))
    for it in range(n_iters):
        _estep_sweep(s, Xobs, K_obs, off_obs, logw)
        ll_hist[it] = oracle_loglikelihoods(Xobs, s["lam"], s["gamma"], K_obs, off_obs)
    A = trained["Sigma"][np.ix_(unobs, obs)] @ trained["invSigma"][np.ix_(obs, obs)]
    eta = trained["mu"][unobs][None, :] + (s["lam"] - trained["mu"][obs][None, :]) @ A.T
    return eta, s, ll_hist


# ---------------------------------------------------------------------------
# IMMCTM inference-path oracles: transform (capability extension following
# MMCTM's pattern — the reference has no IMMCTM transform), fit_heldout
# (src/IMMCTM.jl:468-497) and predict_modality_η (src/IMMCTM.jl:499-545).
# The η/doc-side math is identical to MMCTM's (shared _estep_sweep); only
# the θ log-weights and the mixture likelihood are feature-factorized.
# ---------------------------------------------------------------------------


def _immctm_Eln_m(gamma_m):
    return [digamma(g) - digamma(g.sum(axis=1, keepdims=True)) for g in gamma_m]


def _immctm_logw(gamma, features, K, point=False):
    """Per-modality (V_m, K_m) θ log-weights: Σ_i over feature tables —
    E[ln ϕ] (smoothed) or log of the normalized point estimate."""
    out = []
    for m in range(len(K)):
        V, I = features[m].shape
        if point:
            tables = [
                np.log(g / g.sum(axis=1, keepdims=True)) for g in gamma[m]
            ]
        else:
            tables = _immctm_Eln_m(gamma[m])
        w = np.zeros((V, K[m]))
        for v in range(V):
            for i in range(I):
                w[v] += tables[i][:, features[m][v, i] - 1]
        out.append(w)
    return out


def _immctm_ll(X, lam, gamma, features, K, off):
    """(M,) per-modality normalized mixture ll with per-feature point-ϕ
    products (src/IMMCTM.jl:362-428)."""
    out = np.empty(len(K))
    for m in range(len(K)):
        phi = [g / g.sum(axis=1, keepdims=True) for g in gamma[m]]
        V = X[m].shape[1]
        B = np.ones((K[m], V))
        for v in range(V):
            for i in range(features[m].shape[1]):
                B[:, v] *= phi[i][:, features[m][v, i] - 1]
        ll, Ntot = 0.0, 0.0
        for d in range(X[m].shape[0]):
            lb = lam[d, off[m]: off[m] + K[m]]
            e = np.exp(lb - lb.max())
            P = (e / e.sum()) @ B
            mask = X[m][d] > 0
            ll += np.sum(X[m][d][mask] * np.log(P[mask]))
            Ntot += X[m][d].sum()
        out[m] = ll / Ntot
    return out


def oracle_immctm_transform(Xnew, features, trained, K, n_iters,
                            fit_gaussian=False):
    """IMMCTM fold-in: fresh doc-side state, θ from the per-feature POINT
    estimates (unsmoothed product), μ/Σ frozen unless fit_gaussian (in
    which case they start at 0/I, as in MMCTM's transform)."""
    MK = sum(K)
    off = _offsets(K)
    D = Xnew[0].shape[0]
    lam, nu, zeta = _fresh_docside(Xnew, K)
    if fit_gaussian:
        mu, Sigma, invSigma = np.zeros(MK), np.eye(MK), np.eye(MK)
    else:
        mu = trained["mu"].copy()
        Sigma = trained["Sigma"].copy()
        invSigma = np.linalg.inv(trained["Sigma"])
    s = dict(mu=mu, Sigma=Sigma, invSigma=invSigma,
             gamma=trained["gamma"], lam=lam, nu=nu, zeta=zeta)
    logw = _immctm_logw(trained["gamma"], features, K, point=True)
    ll_hist = np.empty((n_iters, len(K)))
    for it in range(n_iters):
        _estep_sweep(s, Xnew, K, off, logw)
        if fit_gaussian:
            s["mu"] = s["lam"].mean(axis=0)
            E = s["lam"] - s["mu"]
            s["Sigma"] = (np.diag(s["nu"].sum(axis=0)) + E.T @ E) / D
            s["invSigma"] = np.linalg.inv(s["Sigma"])
        ll_hist[it] = _immctm_ll(Xnew, s["lam"], trained["gamma"], features, K, off)
    return s, ll_hist


def oracle_immctm_fit_heldout(Xh, features, trained, K, n_iters):
    """Doc-side-only refit, SMOOTHED θ via the trained per-feature E[ln ϕ]
    (src/IMMCTM.jl:468-497)."""
    off = _offsets(K)
    lam, nu, zeta = _fresh_docside(Xh, K)
    s = dict(
        mu=trained["mu"].copy(), Sigma=trained["Sigma"].copy(),
        invSigma=trained["invSigma"].copy(),
        gamma=trained["gamma"], lam=lam, nu=nu, zeta=zeta,
    )
    logw = _immctm_logw(trained["gamma"], features, K, point=False)
    ll_hist = np.empty((n_iters, len(K)))
    for it in range(n_iters):
        _estep_sweep(s, Xh, K, off, logw)
        ll_hist[it] = _immctm_ll(Xh, s["lam"], trained["gamma"], features, K, off)
    return s, ll_hist


def oracle_immctm_predict_eta(Xobs, features, m, trained, K, n_iters):
    """Cross-modality imputation (src/IMMCTM.jl:499-545): doc-side fit of
    the observed modalities (smoothed θ, sliced globals incl. the [obs,obs]
    block of the FULL inverse), then the linear conditioning estimator.
    `m` and `features` are 0-based / full-model; Xobs holds the observed
    modalities in original order."""
    MK = sum(K)
    off = _offsets(K)
    unobs = np.arange(off[m], off[m] + K[m])
    obs = np.setdiff1d(np.arange(MK), unobs)
    obsM = [i for i in range(len(K)) if i != m]
    K_obs = [K[i] for i in obsM]
    off_obs = _offsets(K_obs)
    f_obs = [features[i] for i in obsM]
    g_obs = [trained["gamma"][i] for i in obsM]

    lam, nu, zeta = _fresh_docside(Xobs, K_obs)
    s = dict(
        mu=trained["mu"][obs].copy(),
        Sigma=trained["Sigma"][np.ix_(obs, obs)].copy(),
        invSigma=trained["invSigma"][np.ix_(obs, obs)].copy(),
        gamma=g_obs, lam=lam, nu=nu, zeta=zeta,
    )
    logw = _immctm_logw(g_obs, f_obs, K_obs, point=False)
    for it in range(n_iters):
        _estep_sweep(s, Xobs, K_obs, off_obs, logw)
    A = trained["Sigma"][np.ix_(unobs, obs)] @ trained["invSigma"][np.ix_(obs, obs)]
    eta = trained["mu"][unobs][None, :] + (s["lam"] - trained["mu"][obs][None, :]) @ A.T
    return eta, s
