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


def test_dp_margin_backs_off_bucket_edges():
    """margin_z pushes cuts past power-of-two survivor edges (round-4
    finding: an exact-DP cut left 511/512 survivors — one lane of
    pilot-to-production noise away from doubling the next phase's padded
    batch, and the measured miss cost 0.45 s of a 6.2 s R=1000 fit)."""
    exact = suggest_compact_schedule(ITERS, boundary_cost_lane_iters=2000,
                                     margin_z=0.0)
    guarded = suggest_compact_schedule(ITERS, boundary_cost_lane_iters=2000,
                                       margin_z=1.0)
    assert exact and guarded
    s = np.sort(ITERS)
    R = ITERS.size

    def survivors(sched):
        return [int(R - np.searchsorted(s, sum(sched[:i + 1]), side="right"))
                for i in range(len(sched))]

    def edge_headroom(n):
        b = 1 << (int(n) - 1).bit_length()
        return (b - n) / b

    # the exact DP rides the edges; the guarded one leaves real headroom
    # at its first (largest-bucket, costliest-to-miss) cut
    assert survivors(guarded)[0] <= survivors(exact)[0]
    assert edge_headroom(survivors(guarded)[0]) >= edge_headroom(survivors(exact)[0])
    assert guarded[0] >= exact[0]


def test_dp_survivor_prediction_clamped_to_production():
    """A cut leaving nearly the whole pilot surviving must not be priced at
    bucket(>R): margin-inflated predictions are clamped to the production
    lane count, so the DP still places the obviously profitable cut where
    99% of lanes finish (review finding, round 4)."""
    iters = np.array([100] * 99 + [400])
    sched = suggest_compact_schedule(
        iters, maxiter=1000, boundary_cost_lane_iters=10.0,
        production_restarts=1000,
    )
    assert sched and sched[0] >= 100


def test_dp_production_scaling_compacts_small_pilots_more():
    """A 64-lane pilot fed in raw makes the absolute boundary charge look
    ~R/P times too expensive for an R=1000 production fit; passing
    production_restarts restores the balance, so the scaled schedule
    compacts at least as much."""
    pilot = np.random.default_rng(5).choice(ITERS, 64, replace=False)
    raw = suggest_compact_schedule(pilot, boundary_cost_lane_iters=8000)
    scaled = suggest_compact_schedule(pilot, boundary_cost_lane_iters=8000,
                                      production_restarts=1000)
    assert len(scaled) >= len(raw)
    assert len(scaled) >= 1


def test_dp_margin_semantics_follow_none_not_numeric_equality():
    """production_restarts=None means 'these ARE the run's own counts'
    (drift-only margin); an EXPLICIT production count keeps the
    pilot-sampling margin term even when it numerically equals the pilot
    size — fit_restarts_auto routinely lands on production == pilot
    (e.g. restarts=100 -> 50/50), and silently dropping the sampling term
    there re-exposes the bucket-edge misses the margin exists to prevent
    (round-5 review finding)."""
    import numpy as np

    from multimodalmusig_tpu.parallel import restarts as rmod

    iters = np.asarray(sorted(ITERS[:64]))
    P = iters.size
    margins = {}
    orig = np.ceil

    for label, kwargs in (
        ("exact", {}),
        ("extrapolated", {"production_restarts": P}),
    ):
        seen = []

        def spy_ceil(x, _seen=seen):
            _seen.append(float(x))
            return orig(x)

        np.ceil = spy_ceil
        try:
            rmod.suggest_compact_schedule(
                iters, boundary_cost_lane_iters=500.0, **kwargs
            )
        finally:
            np.ceil = orig
        margins[label] = seen
    # same R*p everywhere, so a strictly larger sampling margin shows as a
    # strictly larger predicted-survivor argument at every interior cut
    exact = np.asarray(margins["exact"])
    extrap = np.asarray(margins["extrapolated"])
    assert exact.shape == extrap.shape
    interior = (exact > 0) & (exact < P)
    assert interior.any()
    assert (extrap[interior] > exact[interior]).all()


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


def test_fit_restarts_auto_matches_plain_fit(mmctm_fixture):
    """The folded pilot (round-4 verdict #4) partitions the SAME key stream
    into pilot + production executions — on CPU the combined result must
    match the plain unchunked fit to the last ulp, in the original restart
    order."""
    from multimodalmusig_tpu.models.mmctm import MMCTM
    from multimodalmusig_tpu.parallel.restarts import fit_restarts_auto

    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray(mmctm_fixture["alpha"], model.config.dtype)
    key = jax.random.key(7)
    plain = fit_restarts(
        key, model.Xdense, model.config, alpha, restarts=12,
        maxiter=60, tol=1e-3,
    )
    seen = []
    auto, info = fit_restarts_auto(
        key, model.Xdense, model.config, alpha, restarts=12,
        maxiter=60, tol=1e-3, pilot_restarts=5,
        progress=lambda d, t: seen.append((d, t)),
    )
    assert info["pilot_restarts"] == 5
    # last-ulp tolerance (not bit equality): CPU XLA's vectorized
    # reductions can differ in the final ulp between batch shapes
    np.testing.assert_allclose(
        np.asarray(plain.ll), np.asarray(auto.ll), rtol=1e-12, atol=0)
    np.testing.assert_array_equal(
        np.asarray(plain.n_iters), np.asarray(auto.n_iters))
    np.testing.assert_allclose(
        np.asarray(plain.state.lam), np.asarray(auto.state.lam),
        rtol=1e-11, atol=1e-12)
    # progress streamed the pilot first, then rose monotonically to R
    assert seen[0] == (5, 12)
    assert seen[-1][0] == 12
    assert all(a[0] <= b[0] for a, b in zip(seen, seen[1:]))


def test_fit_restarts_auto_tiny_run_falls_back(mmctm_fixture):
    """Below the split threshold the folded pilot degenerates to one
    unchunked fit with an empty schedule."""
    from multimodalmusig_tpu.models.mmctm import MMCTM
    from multimodalmusig_tpu.parallel.restarts import fit_restarts_auto

    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray([0.1, 0.1], model.config.dtype)
    res, info = fit_restarts_auto(
        jax.random.key(0), model.Xdense, model.config, alpha, restarts=4,
        maxiter=20, tol=1e-3,
    )
    assert info["schedule"] == ()
    assert np.asarray(res.ll).shape[0] == 4


def test_two_stage_fit_auto_matches_explicit(mmctm_fixture):
    """two_stage_fit(compact_schedule='auto') must select the same model as
    the plain two-stage fit (CPU: trajectories bit-identical, so the f64
    re-scored picks agree)."""
    from multimodalmusig_tpu.models.mmctm import MMCTM
    from multimodalmusig_tpu.parallel.restarts import two_stage_fit

    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    alpha = jnp.asarray(mmctm_fixture["alpha"], model.config.dtype)
    key = jax.random.key(11)
    best_p, s1_p, _, idx_p = two_stage_fit(
        key, model.Xdense, model.config, alpha, restarts=10, maxiter=40,
    )
    info = {}
    best_a, s1_a, _, idx_a = two_stage_fit(
        key, model.Xdense, model.config, alpha, restarts=10, maxiter=40,
        compact_schedule="auto", pilot_restarts=4, auto_info=info,
    )
    assert info["pilot_restarts"] == 4
    assert int(idx_p) == int(idx_a)
    # last-ulp tolerance, not bit equality: even on CPU, XLA's vectorized
    # reductions can differ in the final ulp between batch shapes (the
    # pilot splits 10 lanes into 4+6), which hundreds of f64 ops surface
    # on a couple of lls at ~1e-16
    np.testing.assert_allclose(
        np.asarray(s1_p.ll), np.asarray(s1_a.ll), rtol=1e-12, atol=0)
    np.testing.assert_allclose(
        np.asarray(best_p.ll), np.asarray(best_a.ll), rtol=1e-12, atol=0)


def test_derive_auto_schedule_is_memoized_against_timing_noise():
    """The derived schedule must not depend on the run-to-run noise of the
    timed pilot wall: a repeat of the identical fit (same pilot iteration
    distribution, same DP inputs) must reuse the first derivation, or the
    DP can flip to a different schedule whose phase bucket shapes force
    fresh XLA compiles inside a production run (measured: ~30 s of compile
    billed as fit time on an R=1000 repeat)."""
    from multimodalmusig_tpu.parallel import restarts as R

    iters = np.random.default_rng(7).integers(40, 300, 64).astype(np.int32)
    s1, info1 = R._derive_auto_schedule(iters, 0.5, 936, 1000, 3)
    assert not info1["schedule_memo_hit"]
    # 40x slower "measured" pilot — without the memo this boundary charge
    # would decline every boundary
    s2, info2 = R._derive_auto_schedule(iters, 20.0, 936, 1000, 3)
    assert info2["schedule_memo_hit"]
    assert s2 == s1
    # the measurements themselves still report the current call's values
    assert info2["pilot_warm_s"] == 20.0
    # different DP inputs derive fresh
    s3, info3 = R._derive_auto_schedule(iters, 20.0, 100, 1000, 3)
    assert not info3["schedule_memo_hit"]
    # a different pilot distribution derives fresh too
    iters_b = np.random.default_rng(8).integers(40, 300, 64).astype(np.int32)
    _, info4 = R._derive_auto_schedule(iters_b, 0.5, 936, 1000, 3)
    assert not info4["schedule_memo_hit"]


def test_schedule_memo_fifo_eviction():
    from multimodalmusig_tpu.parallel import restarts as R

    R._SCHEDULE_MEMO.clear()
    rng = np.random.default_rng(9)
    for i in range(R._SCHEDULE_MEMO_MAX + 5):
        iters = rng.integers(40, 300, 16).astype(np.int32)
        R._derive_auto_schedule(iters, 0.5, 100 + i, 500, 2)
    assert len(R._SCHEDULE_MEMO) == R._SCHEDULE_MEMO_MAX
