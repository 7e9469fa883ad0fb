"""Restart APIs for LDA/ILDA/IMMCTM and profiling utilities."""

import numpy as np
import pytest

from multimodalmusig_tpu.parallel.restarts import (
    fit_ilda_restarts,
    fit_immctm_restarts,
    fit_lda_restarts,
)
from multimodalmusig_tpu.utils.profiling import Timer, check_finite, debug_nans

FEATURES = np.array([[1, 1], [1, 2], [2, 1], [2, 2]])


def test_lda_restarts_picks_best(lda_fixture):
    model = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"],
        restarts=4, maxiter=30,
    )
    assert np.isfinite(model.ll)
    assert np.isfinite(model.elbo)


def test_ilda_restarts(lda_fixture):
    model = fit_ilda_restarts(
        2, 0.1, 0.1, FEATURES, lda_fixture["X"], restarts=3, maxiter=20
    )
    assert np.isfinite(model.ll)


def test_immctm_restarts(mmctm_fixture):
    model = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], restarts=3, maxiter=15,
    )
    assert np.all(np.isfinite(model.ll))


def test_check_finite_passes_and_raises(mmctm_fixture):
    from multimodalmusig_tpu.models.mmctm import MMCTM

    model = MMCTM(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"])
    check_finite(model.state)  # fresh state is finite
    bad = model.state._replace(mu=model.state.mu.at[0].set(np.nan))
    with pytest.raises(FloatingPointError, match="mu"):
        check_finite(bad)


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed >= 0


def test_debug_nans_context():
    import jax

    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == before


def test_immctm_chunked_matches_single_shot(mmctm_fixture):
    kw = dict(restarts=3, maxiter=12, seed=4)
    a = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], **kw,
    )
    b = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], chunk_iters=5, **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-10)
    np.testing.assert_allclose(a.mu, b.mu, rtol=1e-8)


def test_lda_chunked_matches_single_shot(lda_fixture):
    kw = dict(restarts=3, maxiter=25, tol=1e-6, seed=11)
    a = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], **kw,
    )
    b = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], chunk_iters=7, **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-12)
    np.testing.assert_allclose(a.lam, b.lam, rtol=1e-10)


def test_ilda_chunked_matches_single_shot(lda_fixture):
    kw = dict(restarts=3, maxiter=20, seed=12)
    a = fit_ilda_restarts(2, 0.1, 0.1, FEATURES, lda_fixture["X"], **kw)
    b = fit_ilda_restarts(
        2, 0.1, 0.1, FEATURES, lda_fixture["X"], chunk_iters=6, **kw
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-12)
    for i in range(2):
        np.testing.assert_allclose(a.lam[i], b.lam[i], rtol=1e-10)


def test_family_compact_schedule_matches_single_shot(lda_fixture, mmctm_fixture):
    """compact_schedule (the 2-phase straggler fit) on the LDA/ILDA/IMMCTM
    best-of-N fitters must reproduce the single-dispatch results exactly."""
    kw = dict(restarts=3, maxiter=15, seed=4)
    a = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], **kw,
    )
    b = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], compact_schedule=(6,), **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-10)

    kw = dict(restarts=3, maxiter=25, tol=1e-6, seed=11)
    a = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], **kw,
    )
    b = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], compact_schedule=(8, 6), **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-12)

    a = fit_ilda_restarts(2, 0.1, 0.1, FEATURES, lda_fixture["X"],
                          restarts=3, maxiter=20, seed=12)
    b = fit_ilda_restarts(2, 0.1, 0.1, FEATURES, lda_fixture["X"],
                          restarts=3, maxiter=20, seed=12,
                          compact_schedule=(7,))
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-12)


def test_family_auto_compact_matches_plain(lda_fixture, mmctm_fixture):
    """compact_schedule="auto" (the folded-pilot zero-config compaction,
    family analogue of fit_restarts_auto) must select the same model as the
    plain unchunked best-of-N — on CPU the partitioned executions match the
    single dispatch to the last ulp — and record its derivation in
    model.compact_info."""
    kw = dict(restarts=10, maxiter=25, tol=1e-6, seed=11)
    a = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], **kw,
    )
    b = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], compact_schedule="auto", pilot_restarts=4, **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-12)
    np.testing.assert_allclose(a.lam, b.lam, rtol=1e-10)
    assert b.compact_info["pilot_restarts"] == 4
    assert "schedule" in b.compact_info

    kw = dict(restarts=8, maxiter=15, seed=4)
    a = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], **kw,
    )
    b = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], compact_schedule="auto", pilot_restarts=4, **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-10)
    assert b.compact_info["pilot_restarts"] == 4


def test_family_auto_compact_small_r_single_fit(lda_fixture):
    """restarts < 8 under "auto" skips the pilot split entirely (a single
    unchunked fit) and says so in compact_info."""
    kw = dict(restarts=3, maxiter=20, seed=12)
    a = fit_ilda_restarts(2, 0.1, 0.1, FEATURES, lda_fixture["X"], **kw)
    b = fit_ilda_restarts(2, 0.1, 0.1, FEATURES, lda_fixture["X"],
                          compact_schedule="auto", **kw)
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-12)
    assert b.compact_info["schedule"] == ()
    assert "single unchunked fit" in b.compact_info["note"]


def test_family_auto_rejects_chunk_iters(lda_fixture):
    with pytest.raises(ValueError, match="mutually exclusive"):
        fit_lda_restarts(
            lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
            lda_fixture["X"], restarts=8, maxiter=10,
            compact_schedule="auto", chunk_iters=5,
        )


def test_family_shmap_devices_matches_plain(lda_fixture, mmctm_fixture):
    """devices= runs the family best-of-N as a shard_map per-device fan-out
    (the family analogue of shmap_fit_restarts); the selected model must
    match the single-device vmapped fit."""
    import jax

    kw = dict(restarts=6, maxiter=20, tol=1e-6, seed=7)
    a = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], **kw,
    )
    b = fit_lda_restarts(
        lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
        lda_fixture["X"], devices=jax.devices("cpu")[:4], **kw,
    )
    np.testing.assert_allclose(a.ll, b.ll, rtol=1e-6)
    np.testing.assert_allclose(a.lam, b.lam, rtol=1e-5)

    # non-divisible restarts pad by cycling keys; result order preserved
    kw = dict(restarts=5, maxiter=10, seed=2)
    a = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], **kw,
    )
    b = fit_immctm_restarts(
        mmctm_fixture["K"], mmctm_fixture["alpha"], [FEATURES, FEATURES],
        mmctm_fixture["X"], devices=jax.devices("cpu")[:4], **kw,
    )
    np.testing.assert_allclose(np.asarray(a.ll), np.asarray(b.ll), rtol=1e-6)

    with pytest.raises(ValueError, match="incompatible"):
        fit_lda_restarts(
            lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"],
            lda_fixture["X"], restarts=8, maxiter=10,
            devices=jax.devices("cpu")[:4], compact_schedule=(4,),
        )


def test_pilot_cache_eviction():
    """_PILOT_EXEC_CACHE is FIFO-capped so per-K auto-compaction sweeps
    can't retain unbounded compiled executables in a long-lived process."""
    from multimodalmusig_tpu.parallel import restarts as r

    saved = dict(r._PILOT_EXEC_CACHE)
    r._PILOT_EXEC_CACHE.clear()
    try:
        for i in range(r._PILOT_EXEC_CACHE_MAX + 5):
            r._pilot_cache_put(("sig", i), object())
        assert len(r._PILOT_EXEC_CACHE) == r._PILOT_EXEC_CACHE_MAX
        assert ("sig", 0) not in r._PILOT_EXEC_CACHE  # oldest evicted
        assert ("sig", r._PILOT_EXEC_CACHE_MAX + 4) in r._PILOT_EXEC_CACHE
    finally:
        r._PILOT_EXEC_CACHE.clear()
        r._PILOT_EXEC_CACHE.update(saved)


def test_family_fitters_reuse_executables():
    """The family runners are module-level jits taking X as an ARGUMENT
    (not a closure constant), so (a) repeat fitter calls hit jax.jit's
    in-memory cache — no per-call re-trace — and (b) two same-shape
    datasets share one executable yet get their own results (the compiled
    program contains no dataset values)."""
    from multimodalmusig_tpu.parallel.restarts import _lda_restarts_from_keys

    rng = np.random.default_rng(0)
    X1 = [list(np.stack([np.arange(1, 5), rng.integers(1, 9, 4)]).T)
          for _ in range(3)]
    X2 = [list(np.stack([np.arange(1, 5), rng.integers(9, 17, 4)]).T)
          for _ in range(3)]
    kw = dict(restarts=4, maxiter=12, tol=1e-6, seed=3)

    before = _lda_restarts_from_keys._cache_size()
    a1 = fit_lda_restarts(2, 0.1, 0.1, X1, **kw)
    grew = _lda_restarts_from_keys._cache_size()
    a2 = fit_lda_restarts(2, 0.1, 0.1, X1, **kw)
    b = fit_lda_restarts(2, 0.1, 0.1, X2, **kw)
    after = _lda_restarts_from_keys._cache_size()

    assert grew == before + 1
    assert after == grew  # same executable served all three calls
    np.testing.assert_array_equal(a1.lam, a2.lam)  # determinism intact
    assert not np.allclose(a1.lam, b.lam)  # X really is an argument
