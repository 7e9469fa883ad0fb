"""Auto-compaction: runtime boundary-cost calibration + pilot-derived
schedules (round-3 verdict items 5/6).

The DP's boundary placement must respond to the measured boundary cost —
a tunnel-priced boundary (~8000 lane-iters) places few boundaries, a
locally-attached device (cheap boundaries) compacts much more aggressively.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimodalmusig_tpu.models.mmctm import MMCTMConfig
from multimodalmusig_tpu.parallel.restarts import (
    auto_compact_schedule,
    fit_restarts,
    measure_boundary_seconds,
    suggest_compact_schedule,
)


# A realistic straggler distribution (shaped like the measured BRCA R=1000
# one: p50 ~132, long tail to ~406).
ITERS = np.concatenate(
    [
        np.random.default_rng(0).integers(100, 160, 500),
        np.random.default_rng(1).integers(160, 260, 400),
        np.random.default_rng(2).integers(260, 406, 100),
    ]
)


def test_dp_schedules_respond_to_boundary_cost():
    expensive = suggest_compact_schedule(ITERS, boundary_cost_lane_iters=8000)
    cheap = suggest_compact_schedule(ITERS, boundary_cost_lane_iters=50)
    assert expensive != cheap
    assert len(cheap) >= len(expensive)
    # free boundaries with no cap -> cut at every opportunity that shrinks
    # the padded bucket; the schedule grows well beyond the tunnel default's
    free = suggest_compact_schedule(
        ITERS, boundary_cost_lane_iters=0.0, max_boundaries=10
    )
    assert len(free) > len(expensive)


def test_dp_expensive_boundaries_mean_no_schedule():
    # if one boundary costs more than the whole fit, don't cut at all
    sched = suggest_compact_schedule(ITERS, boundary_cost_lane_iters=1e9)
    assert sched == ()


def test_measure_boundary_seconds_returns_positive():
    t = measure_boundary_seconds(reps=2)
    assert 0 < t < 60


def test_auto_compact_schedule_end_to_end(mmctm_fixture):
    from multimodalmusig_tpu.models.mmctm import MMCTM

    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray(mmctm_fixture["alpha"], model.config.dtype)
    key = jax.random.key(3)
    schedule, info = auto_compact_schedule(
        key, model.Xdense, model.config, alpha,
        restarts=16, maxiter=60, tol=1e-3, pilot_restarts=6,
    )
    assert info["pilot_restarts"] == 6
    assert info["lane_iters_per_s"] > 0
    assert info["boundary_cost_lane_iters"] > 0
    assert tuple(info["schedule"]) == tuple(schedule)
    # whatever schedule came out must be consumable by fit_restarts and give
    # finite lls on every lane
    result = fit_restarts(
        key, model.Xdense, model.config, alpha, restarts=16,
        maxiter=60, tol=1e-3, compact_schedule=schedule or None,
    )
    assert np.isfinite(np.asarray(result.ll)).all()


def test_fit_mmctm_restarts_accepts_auto(mmctm_fixture):
    from multimodalmusig_tpu.parallel.restarts import fit_mmctm_restarts

    model = fit_mmctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"],
        restarts=8, maxiter=40, compact_schedule="auto", pilot_restarts=4,
    )
    assert model.ll is not None and np.isfinite(model.ll).all()
    assert model.compact_info["pilot_restarts"] == 4
