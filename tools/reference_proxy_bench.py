"""Reference-architecture proxy benchmark (CPU).

The Julia reference cannot run here (no Julia in the image), so this measures
an honest stand-in for its ARCHITECTURE: a literal single-threaded
per-document CAVI iteration — for each document, a ragged θ update followed
by bound-constrained scipy maximizations of the ν- and λ-objectives (the
role NLopt LD_MMA plays at src/MMCTM.jl:127-170) — exactly the loop structure
of src/MMCTM.jl:457-494, written with NumPy/SciPy.

Compares per-CAVI-iteration wall-clock against this package's batched
implementation on the same data, same machine, one CPU. Run:

    python tools/reference_proxy_bench.py [--docs 560] [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.optimize
from scipy.special import digamma


def proxy_iteration(X, K, state):
    """One reference-style CAVI iteration: per-doc ζ/θ/ν/λ, then μ/Σ/γ."""
    M = len(K)
    offsets = np.concatenate([[0], np.cumsum(K)]).astype(int)
    MK = offsets[-1]
    D = len(X[0])

    Eln = [digamma(g) - digamma(g.sum(axis=1, keepdims=True)) for g in state["gamma"]]
    invS = state["invSigma"]
    mu = state["mu"]

    for d in range(D):
        lam, nu = state["lam"][d], state["nu"][d]
        # ζ (closed form)
        zeta = np.array(
            [
                np.exp(lam[offsets[m]:offsets[m + 1]] + 0.5 * nu[offsets[m]:offsets[m + 1]]).sum()
                for m in range(M)
            ]
        )
        # θ per ragged doc + sufficient statistics
        sumtheta = np.zeros(MK)
        Ndivzeta = np.zeros(MK)
        for m in range(M):
            doc = X[m][d]  # (n, 2) sparse rows
            N_dm = doc[:, 1].sum()
            Ndivzeta[offsets[m]:offsets[m + 1]] = N_dm / zeta[m]
            for v, c in doc:
                logits = lam[offsets[m]:offsets[m + 1]] + Eln[m][:, v - 1]
                th = np.exp(logits - logits.max())
                th /= th.sum()
                sumtheta[offsets[m]:offsets[m + 1]] += c * th

        # ν maximization (bound-constrained, the NLopt role)
        def neg_nu(nu_):
            e = np.exp(lam + 0.5 * nu_)
            return 0.5 * (nu_ * np.diag(invS)).sum() + (Ndivzeta * e).sum() - 0.5 * np.log(nu_).sum()

        res = scipy.optimize.minimize(
            neg_nu, nu, method="L-BFGS-B", bounds=[(1e-7, None)] * MK,
            options={"maxiter": 25},
        )
        state["nu"][d] = res.x

        # λ maximization
        def neg_lam(l):
            diff = l - mu
            e = np.exp(l + 0.5 * state["nu"][d])
            return 0.5 * diff @ invS @ diff - (l * sumtheta).sum() + (Ndivzeta * e).sum()

        def neg_lam_grad(l):
            e = np.exp(l + 0.5 * state["nu"][d])
            return invS @ (l - mu) - sumtheta + Ndivzeta * e

        res = scipy.optimize.minimize(
            neg_lam, lam, jac=neg_lam_grad, method="L-BFGS-B",
            options={"maxiter": 25},
        )
        state["lam"][d] = res.x

    # M-step
    state["mu"] = state["lam"].mean(axis=0)
    E = state["lam"] - state["mu"]
    Sigma = (np.diag(state["nu"].sum(axis=0)) + E.T @ E) / D
    state["Sigma"] = Sigma
    state["invSigma"] = np.linalg.inv(Sigma)
    for m in range(M):
        state["gamma"][m][:] = 0.1  # alpha
    # γ scatter (per-doc ragged)
    for m in range(M):
        for d in range(D):
            lam = state["lam"][d]
            for v, c in X[m][d]:
                logits = lam[offsets[m]:offsets[m + 1]] + Eln[m][:, v - 1]
                th = np.exp(logits - logits.max())
                th /= th.sum()
                state["gamma"][m][:, v - 1] += c * th
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=560)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv
    from multimodalmusig_tpu.utils.data import brca_counts_path
    from multimodalmusig_tpu.utils.formatting import make_count_matrix

    snv, _, samples = read_counts_tsv(brca_counts_path("brca-eu_snv_counts.tsv"))
    sv, _, _ = read_counts_tsv(brca_counts_path("brca-eu_sv_counts.tsv"))
    D = min(args.docs, len(samples))
    K = [7, 7]
    MK = sum(K)
    X = [
        [make_count_matrix(snv[:, d]) for d in range(D)],
        [make_count_matrix(sv[:, d]) for d in range(D)],
    ]
    rng = np.random.default_rng(0)
    state = dict(
        lam=np.zeros((D, MK)),
        nu=np.ones((D, MK)),
        mu=np.zeros(MK),
        Sigma=np.eye(MK),
        invSigma=np.eye(MK),
        gamma=[rng.integers(1, 101, size=(K[0], snv.shape[0])).astype(float),
               rng.integers(1, 101, size=(K[1], sv.shape[0])).astype(float)],
    )

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state = proxy_iteration(X, K, state)
    per_iter_proxy = (time.perf_counter() - t0) / args.iters
    print(f"reference-architecture proxy: {per_iter_proxy:.3f}s per CAVI iteration "
          f"(D={D}, single CPU, per-doc scipy solves)")

    # our batched implementation on the same machine/CPU
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        import jax.numpy as jnp

        from multimodalmusig_tpu.models import mmctm as mmod
        from multimodalmusig_tpu.models.ctm_base import counts_per_doc
        from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha

        config = MMCTMConfig(K=(7, 7), V=(snv.shape[0], sv.shape[0]), D=D, dtype=jnp.float32)
        Xd = (jnp.asarray(snv[:, :D].T, jnp.float32), jnp.asarray(sv[:, :D].T, jnp.float32))
        st = init_with_alpha(jax.random.key(0), config, Xd, [0.1, 0.1])
        N = counts_per_doc(Xd)
        step = jax.jit(lambda s: mmod.fit_step_fn(Xd, N, config)(s)[0])
        st = step(st)
        jax.tree_util.tree_map(np.asarray, st)  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st = step(st)
        jax.tree_util.tree_map(np.asarray, st)
        per_iter_ours = (time.perf_counter() - t0) / args.iters

    print(f"this package (batched, same CPU): {per_iter_ours * 1000:.1f}ms per CAVI iteration")
    print(f"architecture speedup on one CPU: {per_iter_proxy / per_iter_ours:.0f}x")


if __name__ == "__main__":
    main()
