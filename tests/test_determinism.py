"""Reproducibility: explicit PRNG keys replace the reference's global
Random.seed!/NLopt.srand (run_mmctm.jl:77-80) — same seed, same results."""

import numpy as np

import multimodalmusig_tpu as mm
from multimodalmusig_tpu.parallel.restarts import fit_mmctm_restarts


def test_lda_same_seed_identical(lda_fixture):
    a = mm.LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"], seed=42)
    b = mm.LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"], seed=42)
    lla = a.fit(maxiter=20, verbose=False)
    llb = b.fit(maxiter=20, verbose=False)
    np.testing.assert_array_equal(lla, llb)
    np.testing.assert_array_equal(a.lam, b.lam)


def test_lda_different_seed_differs(lda_fixture):
    a = mm.LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"], seed=1)
    b = mm.LDA(lda_fixture["K"], lda_fixture["alpha"], lda_fixture["eta"], lda_fixture["X"], seed=2)
    assert not np.array_equal(a.lam, b.lam)


def test_mmctm_restart_protocol_reproducible(mmctm_fixture):
    kw = dict(restarts=3, maxiter=12, seed=99)
    a = fit_mmctm_restarts(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"], **kw)
    b = fit_mmctm_restarts(mmctm_fixture["K"], mmctm_fixture["alpha"], mmctm_fixture["X"], **kw)
    np.testing.assert_array_equal(a.ll, b.ll)
    np.testing.assert_array_equal(a.mu, b.mu)
    np.testing.assert_array_equal(a.stage1_ll, b.stage1_ll)
