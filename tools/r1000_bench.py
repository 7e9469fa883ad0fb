"""The reference CLI's default scale: R=1000 restarts on BRCA-EU, one chip.

scripts/run_mmctm.jl defaults to --restarts 1000 (run_mmctm.jl:52) across a
Julia worker pool; here all 1000 restarts are one vmapped single-chip
program. Records wall-clock and restarts/s to BENCH_LOCAL.json.
Also sanity-checks the fused-kernel path on IMMCTM (shared solve_lambda).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def brca_r1000(restarts=1000):
    import jax
    import jax.numpy as jnp

    from bench import load_counts_np
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig
    from multimodalmusig_tpu.parallel.restarts import fit_restarts

    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    key = jax.random.key(147959412)
    kwargs = dict(restarts=restarts, maxiter=1000, tol=1e-5, chunk_iters=None)
    t0 = time.perf_counter()
    np.asarray(fit_restarts(key, X, config, alpha, **kwargs).ll)
    t_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = fit_restarts(key, X, config, alpha, **kwargs)
    ll = np.asarray(res.ll)
    t = time.perf_counter() - t0
    iters = np.asarray(res.n_iters)
    out = {
        "metric": "brca_r1000_fit",
        "platform": jax.devices()[0].platform,
        "restarts": restarts,
        "tol": 1e-5,
        "wall_clock_s": round(t, 3),
        "warm_run_s": round(t_warm, 3),
        "restarts_per_s": round(restarts / t, 2),
        "iters_median": int(np.median(iters)),
        "iters_max": int(iters.max()),
        "finite_lanes": int(np.isfinite(ll).all(axis=1).sum()),
        "best_ll": [float(v) for v in np.nanmax(np.where(np.isfinite(ll), ll, -np.inf), axis=0)],
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_LOCAL.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        data = {}
    data.setdefault("brca_r1000", []).append(out)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def immctm_sanity():
    """IMMCTM fit on the TPU with the shared fused-kernel path: finite + sane."""
    import jax

    from multimodalmusig_tpu.models.immctm import IMMCTM

    rng = np.random.default_rng(0)
    D, K = 200, [3, 2]
    # 1-based (V_m, I_m) feature tables: vocab = product of feature values
    features = [
        1 + np.stack(
            np.meshgrid(np.arange(4), np.arange(3), indexing="ij"), -1
        ).reshape(-1, 2),
        1 + np.stack(
            np.meshgrid(np.arange(2), np.arange(3), indexing="ij"), -1
        ).reshape(-1, 2),
    ]
    X = []
    for _ in range(D):
        doc = []
        for f in features:
            V = f.shape[0]
            counts = rng.integers(0, 15, size=V)
            nz = np.nonzero(counts)[0]
            doc.append(np.stack([nz + 1, counts[nz]], axis=1))
        X.append(doc)
    model = IMMCTM(K, [0.1, 0.1], features, X)
    ll_hist = model.fit(maxiter=50, tol=1e-4, verbose=False)
    ll = np.asarray(model.ll)
    print(f"IMMCTM on {jax.default_backend()}: ll={ll} elbo={model.elbo:.2f} "
          f"iters={len(ll_hist)} finite={np.isfinite(ll).all() and np.isfinite(model.elbo)}")


if __name__ == "__main__":
    if "--immctm-only" in sys.argv:
        immctm_sanity()
    else:
        brca_r1000()
        immctm_sanity()
