"""Pallas kernel correctness vs. the pure-jnp solvers (interpret mode on CPU;
the same kernels compile natively on TPU).

Also covers the DEMOTED kernel experiments (tools/pallas_experiments/ —
fused E-step, fused θ-moments): they measured slower than XLA at every
operating point and left the package in round 5, but their parity pins stay
live so the archived experiments remain correct starting points."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from multimodalmusig_tpu.ops.pallas.lambda_kernel import maximize_lambda_fused
from multimodalmusig_tpu.ops.solvers import lambda_grad, maximize_lambda

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)


@pytest.fixture
def problem(rng):
    MK, B = 14, 96
    A = rng.normal(size=(MK, MK))
    invS = jnp.asarray(np.eye(MK) + 0.05 * (A @ A.T) / MK, jnp.float32)
    return dict(
        lam0=jnp.zeros((B, MK), jnp.float32),
        nu=jnp.asarray(rng.uniform(0.5, 1.5, (B, MK)), jnp.float32),
        ndz=jnp.asarray(rng.uniform(1, 10, (B, MK)), jnp.float32),
        st=jnp.asarray(rng.uniform(0, 5, (B, MK)), jnp.float32),
        mu=jnp.asarray(rng.normal(size=MK), jnp.float32),
        invS=invS,
    )


def test_fused_lambda_matches_jnp_solver(problem):
    ref = np.asarray(
        maximize_lambda(
            problem["lam0"], problem["nu"], problem["ndz"], problem["st"],
            problem["mu"], problem["invS"],
        )
    )
    fused = np.asarray(
        maximize_lambda_fused(
            problem["lam0"], problem["nu"], problem["ndz"], problem["st"],
            problem["mu"], problem["invS"], tile_b=128, interpret=True,
        )
    )
    np.testing.assert_allclose(fused, ref, atol=5e-5)


def test_fused_lambda_is_stationary(problem):
    fused = maximize_lambda_fused(
        problem["lam0"], problem["nu"], problem["ndz"], problem["st"],
        problem["mu"], problem["invS"], tile_b=128, interpret=True,
    )
    g = np.asarray(
        jnp.stack(
            [
                lambda_grad(
                    fused[i], problem["nu"][i], problem["ndz"][i],
                    problem["st"][i], problem["mu"], problem["invS"],
                )
                for i in range(0, 96, 16)
            ]
        )
    )
    # float32 kernel: gradient small relative to the count scale (~10)
    assert np.abs(g).max() < 1e-2


def test_fused_lambda_ragged_batch(problem):
    """B not a multiple of tile_b exercises the padding path."""
    sl = slice(0, 33)
    fused = np.asarray(
        maximize_lambda_fused(
            problem["lam0"][sl], problem["nu"][sl], problem["ndz"][sl],
            problem["st"][sl], problem["mu"], problem["invS"],
            tile_b=128, interpret=True,
        )
    )
    ref = np.asarray(
        maximize_lambda(
            problem["lam0"][sl], problem["nu"][sl], problem["ndz"][sl],
            problem["st"][sl], problem["mu"], problem["invS"],
        )
    )
    np.testing.assert_allclose(fused, ref, atol=5e-5)


def test_mk_over_lane_budget_raises(problem):
    big = jnp.zeros((8, 200), jnp.float32)
    with pytest.raises(ValueError, match="lane budget"):
        maximize_lambda_fused(
            big, big, big, big, jnp.zeros(200), jnp.eye(200), interpret=True
        )


def test_restart_batched_fused_matches_per_lane(problem, rng):
    """Each restart lane has its own mu/invSigma; the restart-batched kernel
    must match per-lane jnp solves."""
    from multimodalmusig_tpu.ops.pallas.lambda_kernel import (
        maximize_lambda_fused_restarts,
    )

    R, D, MK = 3, 40, 14
    lam0 = jnp.zeros((R, D, MK), jnp.float32)
    nu = jnp.asarray(rng.uniform(0.5, 1.5, (R, D, MK)), jnp.float32)
    ndz = jnp.asarray(rng.uniform(1, 10, (R, D, MK)), jnp.float32)
    st = jnp.asarray(rng.uniform(0, 5, (R, D, MK)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(R, MK)), jnp.float32)
    invS = []
    for r in range(R):
        A = rng.normal(size=(MK, MK))
        invS.append(np.eye(MK) + 0.05 * (A @ A.T) / MK)
    invS = jnp.asarray(np.stack(invS), jnp.float32)

    fused = np.asarray(
        maximize_lambda_fused_restarts(
            lam0, nu, ndz, st, mu, invS, tile_b=128, interpret=True
        )
    )
    for r in range(R):
        ref = np.asarray(
            maximize_lambda(lam0[r], nu[r], ndz[r], st[r], mu[r], invS[r])
        )
        np.testing.assert_allclose(fused[r], ref, atol=5e-5)


class TestFusedEstep:
    """estep_eta_fused (ζ → N/ζ → ν → λ in one kernel) vs the XLA sequence."""

    def _xla_reference(self, lam, nu, N, st, mu, invS, config):
        from multimodalmusig_tpu.models.ctm_base import (
            calculate_Ndivzeta,
            update_zeta,
        )
        from multimodalmusig_tpu.ops.solvers import maximize_nu

        zeta = update_zeta(lam, nu, config)
        ndz = calculate_Ndivzeta(N, zeta, config)
        nu2 = maximize_nu(nu, lam, ndz, jnp.diagonal(invS)[None, :])
        lam2 = maximize_lambda(lam, nu2, ndz, st, mu, invS)
        return zeta, nu2, lam2

    def test_matches_xla_sequence(self, rng):
        from pallas_experiments.estep_kernel import estep_eta_fused

        from multimodalmusig_tpu.models.ctm_base import CTMBaseConfig

        K, B = (3, 4), 17
        MK = sum(K)
        config = CTMBaseConfig(K=K, V=(5, 5), D=B, dtype=jnp.float32)
        lam = jnp.asarray(rng.standard_normal((B, MK)), jnp.float32)
        nu = jnp.asarray(rng.uniform(0.05, 1.0, (B, MK)), jnp.float32)
        N = jnp.asarray(rng.integers(0, 40, (B, len(K))), jnp.float32)
        st = jnp.asarray(rng.uniform(0.0, 10.0, (B, MK)), jnp.float32)
        mu = jnp.asarray(rng.standard_normal(MK), jnp.float32)
        A = rng.standard_normal((MK, MK)).astype(np.float32)
        invS = jnp.asarray(A @ A.T + 0.5 * np.eye(MK, dtype=np.float32))

        got = estep_eta_fused(
            lam, nu, N, st, mu, invS, K, tile_b=128, interpret=True
        )
        want = self._xla_reference(lam, nu, N, st, mu, invS, config)
        for g, w, label in zip(got, want, ("zeta", "nu", "lam")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-6,
                err_msg=label,
            )

    def test_zero_count_modality(self, rng):
        # a document with zero counts in one modality: N/ζ = 0, the ν/λ
        # solves must stay finite (the 0·exp guard)
        from pallas_experiments.estep_kernel import estep_eta_fused

        K, B = (2, 2), 5
        MK = sum(K)
        lam = jnp.zeros((B, MK), jnp.float32)
        nu = jnp.ones((B, MK), jnp.float32)
        N = jnp.asarray(rng.integers(0, 30, (B, 2)), jnp.float32).at[0, 1].set(0.0)
        st = jnp.asarray(rng.uniform(0.0, 5.0, (B, MK)), jnp.float32).at[0, 2:].set(0.0)
        mu = jnp.zeros(MK, jnp.float32)
        invS = jnp.eye(MK, dtype=jnp.float32)
        zeta, nu2, lam2 = estep_eta_fused(
            lam, nu, N, st, mu, invS, K, tile_b=128, interpret=True
        )
        assert np.isfinite(np.asarray(zeta)).all()
        assert np.isfinite(np.asarray(nu2)).all()
        assert np.isfinite(np.asarray(lam2)).all()


class TestThetaMoments:
    """theta_moments_fused vs the reference einsums (interpret mode)."""

    def _reference(self, lam_block, logw, X):
        logits = lam_block[:, None, :] + logw[None, :, :]
        theta = np.exp(logits - logits.max(axis=-1, keepdims=True))
        theta /= theta.sum(axis=-1, keepdims=True)
        st = np.einsum("dv,dvk->dk", X, theta)
        ct = np.einsum("dv,dvk->kv", X, theta)
        return st, ct

    @pytest.mark.parametrize("D,V,K", [(17, 96, 7), (560, 48, 7), (33, 128, 11), (8, 5, 2)])
    def test_matches_einsums(self, rng, D, V, K):
        from pallas_experiments.theta_kernel import theta_moments_fused

        lam = rng.standard_normal((D, K)).astype(np.float32) * 2.0
        logw = (rng.standard_normal((V, K)) - 4.0).astype(np.float32)
        X = rng.integers(0, 30, (D, V)).astype(np.float32)
        st, ct = theta_moments_fused(
            jnp.asarray(lam), jnp.asarray(logw), jnp.asarray(X),
            tile_d=16, interpret=True,
        )
        st_ref, ct_ref = self._reference(lam, logw, X)
        np.testing.assert_allclose(np.asarray(st), st_ref, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ct), ct_ref, rtol=2e-5, atol=1e-4)

    def test_vocab_over_budget_raises(self, rng):
        from pallas_experiments.theta_kernel import theta_moments_fused

        with pytest.raises(ValueError):
            theta_moments_fused(
                jnp.zeros((4, 2)), jnp.zeros((200, 2)), jnp.zeros((4, 200)),
                interpret=True,
            )

    def test_matches_production_moments(self, mmctm_fixture):
        """The demoted kernel agrees with the PRODUCTION factorized moments
        (ctm_base.theta_moments) on the reference fixture — the linkage the
        old gate-integration test pinned before the gate was removed."""
        from pallas_experiments.theta_kernel import theta_moments_fused

        from multimodalmusig_tpu.models.ctm_base import theta_moments
        from multimodalmusig_tpu.models.mmctm import MMCTM, smoothed_logw

        model = MMCTM(
            mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"],
            dtype=jnp.float64,
        )
        logw = smoothed_logw(model.state)
        st_prod, ct_prod = theta_moments(
            model.state.lam, logw, model.Xdense, model.config
        )
        off = 0
        for m in range(model.config.M):
            K = model.config.K[m]
            st_m, ct_m = theta_moments_fused(
                model.config.block(model.state.lam, m).astype(jnp.float32),
                logw[m].astype(jnp.float32),
                model.Xdense[m].astype(jnp.float32),
                tile_d=8, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(st_m), np.asarray(st_prod[:, off:off + K]),
                rtol=2e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(ct_m), np.asarray(ct_prod[m]), rtol=2e-5, atol=1e-5
            )
            off += K
