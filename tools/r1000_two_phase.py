"""A/B the 2-phase straggler compaction at the reference's default scale.

R=1000 restarts (run_mmctm.jl:52) on BRCA-EU, one chip: unchunked
single-dispatch fit (every lane pays for the slowest lane's ~3x-median
iteration tail) vs compact_schedule variants (run everyone to a cutoff,
compact converged lanes out on device, finish survivors). All arms share
keys, so trajectories — and therefore compaction bucket sizes and cached
executables — are deterministic.

Usage: python tools/r1000_two_phase.py [schedule ...]
  schedule syntax: comma-separated iteration budgets, e.g. 185 or 190,80
  default arms: unchunked, 185, "190,80", 233 (the arms recorded in
  BENCH_LOCAL.json; 190,80 won at 9.41 s vs 14.48 s unchunked)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    import jax
    import jax.numpy as jnp

    from bench import load_counts_np
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig
    from multimodalmusig_tpu.parallel.restarts import fit_restarts

    restarts = int(os.environ.get("R", "1000"))
    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    key = jax.random.key(147959412)

    # Default cutoffs sized to the measured iteration distribution at R=1000
    # (p50:132 p75:185 p90:233 p99:308 max:406) and to the driver's
    # power-of-two survivor bucketing: a cutoff just past p75 leaves <=256
    # survivors (one bucket), a second boundary near p95 shrinks to <=64.
    arms = [None]
    for a in argv or ["185", "190,80", "233"]:
        arms.append(tuple(int(v) for v in a.split(",")))

    results = {}
    ll_ref = None
    for arm in arms:
        name = "unchunked" if arm is None else ",".join(map(str, arm))
        kwargs = dict(restarts=restarts, maxiter=1000, tol=1e-5,
                      compact_schedule=arm)
        # warm: identical program(s) — deterministic keys mean the same
        # compaction buckets, so the timed run hits every cached executable
        t0 = time.perf_counter()
        res = fit_restarts(key, X, config, alpha, **kwargs)
        ll = np.asarray(res.ll)
        t_warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = fit_restarts(key, X, config, alpha, **kwargs)
        ll = np.asarray(res.ll)
        t = time.perf_counter() - t0
        iters = np.asarray(res.n_iters)
        if ll_ref is None:
            ll_ref = ll
            pct = {p: int(np.percentile(iters, p)) for p in (50, 75, 90, 95, 99, 100)}
            print(f"iteration percentiles: {pct}", flush=True)
        else:
            # On TPU the phase programs are different executables from the
            # single-dispatch fit, and XLA fuses/rounds them differently;
            # hundreds of f32 CAVI iterations amplify 1-ulp differences to
            # ~1e-3 on a few lanes' final ll (on CPU the trajectories are
            # bit-identical — tests/test_chunked.py). Model selection only
            # consumes the per-modality best, so compare that tightly and
            # the lane population loosely.
            finite = np.isfinite(ll_ref)
            assert np.array_equal(finite, np.isfinite(ll)), "finite-lane mismatch"
            np.testing.assert_allclose(
                np.max(np.where(finite, ll, -np.inf), axis=0),
                np.max(np.where(finite, ll_ref, -np.inf), axis=0),
                rtol=1e-4,
            )
            np.testing.assert_allclose(ll[finite], ll_ref[finite], rtol=5e-3)
        results[name] = dict(
            wall_s=round(t, 3), warm_s=round(t_warm, 3),
            restarts_per_s=round(restarts / t, 1),
            finite=int(np.isfinite(ll).all(axis=1).sum()),
        )
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps({"R": restarts, "arms": results}))


if __name__ == "__main__":
    main(sys.argv[1:])
