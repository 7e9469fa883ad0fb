"""Dead-lane (non-finite ll) handling in the CAVI loop and restart selection.

A restart whose log-likelihood goes non-finite can never recover (every
subsequent update propagates NaN) nor converge (NaN compares false against
any tolerance), so run_cavi terminates it immediately instead of computing
NaNs to maxiter — a documented divergence from the reference, which loops to
maxiter (src/common.jl:48-56 returns false on NaN input). Restart selection
masks such lanes out (parallel/restarts.py) — covered by
tests/test_parallel.py::TestNaNLaneTolerance; here we pin the *termination*
part.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalmusig_tpu.models.ctm_base import CTMBaseConfig, run_cavi


def _run(step_fn, maxiter=50, tol=1e-4):
    config = CTMBaseConfig(K=(2,), V=(3,), D=1, dtype=jnp.float64)
    state = jnp.zeros(())
    return run_cavi(state, config, maxiter, tol, step_fn)


def test_nan_ll_terminates_lane_immediately():
    def step(s):
        s = s + 1.0
        ll = jnp.where(s >= 7.0, jnp.full((1,), jnp.nan), -1.0 / s * jnp.ones((1,)))
        return s, ll

    state, ll_buf, n_iters, converged = jax.jit(
        lambda s0: _run(step)
    )(jnp.zeros(()))
    # NaN first appears at iteration 7 -> the loop stops right there,
    # far before maxiter=50 (and before MIN_ITERS would allow convergence).
    assert int(n_iters) == 7
    assert bool(converged)
    assert not np.isfinite(np.asarray(ll_buf)[6]).any()


def test_inf_ll_terminates_lane():
    def step(s):
        s = s + 1.0
        ll = jnp.where(s >= 3.0, jnp.full((1,), -jnp.inf), -1.0 * jnp.ones((1,)))
        return s, ll

    _, _, n_iters, converged = _run(step)
    assert int(n_iters) == 3
    assert bool(converged)


def test_finite_lane_unaffected():
    # A well-behaved trajectory still follows the reference's convergence
    # rule: > MIN_ITERS iterations, then relative-change < tol.
    def step(s):
        s = s + 1.0
        return s, (-1.0 - 0.5 ** s) * jnp.ones((1,))

    _, _, n_iters, converged = _run(step, maxiter=50, tol=1e-4)
    assert bool(converged)
    assert 10 < int(n_iters) < 50


def test_dead_lane_reports_not_converged_publicly():
    # The loop's carry flag is a *termination* marker (True for dead lanes so
    # they stop early); public results must still say converged=False.
    from multimodalmusig_tpu.models.ctm_base import carry_converged

    ll_buf = jnp.zeros((10, 2)).at[4].set(jnp.nan)
    done = jnp.array(True)
    assert not bool(carry_converged(ll_buf, jnp.int32(5), done))   # NaN final ll
    ll_buf = jnp.zeros((10, 2)).at[4].set(-3.0)
    assert bool(carry_converged(ll_buf, jnp.int32(5), done))       # finite final ll
    assert not bool(carry_converged(ll_buf, jnp.int32(5), jnp.array(False)))


def test_lda_restart_selection_masks_nan_lanes(lda_fixture):
    # A diverged lane's ll is NaN; argmax over raw values would pick it
    # (NaN compares as max). fit_lda_restarts masks non-finite lanes.
    from multimodalmusig_tpu.parallel.restarts import fit_lda_restarts

    model = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], restarts=4, maxiter=20,
    )
    assert np.isfinite(model.ll)


def test_vmapped_dead_lane_does_not_stall_batch():
    # Under vmap the while_loop runs until every lane is done; a dead lane
    # must not keep the batch alive to maxiter.
    def step_for(k):
        def step(s):
            s = s + 1.0
            ll = jnp.where(
                (k == 0) & (s >= 5.0),
                jnp.full((1,), jnp.nan),
                (-1.0 - 0.5 ** s) * jnp.ones((1,)),
            )
            return s, ll

        return step

    def one(k):
        config = CTMBaseConfig(K=(2,), V=(3,), D=1, dtype=jnp.float64)
        return run_cavi(jnp.zeros(()), config, 1000, 1e-4, step_for(k))

    _, _, n_iters, converged = jax.vmap(one)(jnp.arange(3))
    assert bool(converged.all())
    assert int(np.asarray(n_iters)[0]) == 5       # dead lane stops at NaN
    assert int(np.asarray(n_iters).max()) < 100   # batch never nears maxiter
