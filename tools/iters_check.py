"""Quick check: outer-iteration distribution + unchunked wall-clock of the
R-restart BRCA fit on the default device. Used to A/B numerics changes that
may shift CAVI convergence (e.g. θ-moment contraction precision)."""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    kwargs = dict(restarts=args.restarts, maxiter=1000, tol=args.tol)
    res = fit_restarts(key, X, config, alpha, **kwargs)  # warm
    np.asarray(res.ll)
    t0 = time.perf_counter()
    res = fit_restarts(key, X, config, alpha, **kwargs)
    ll = np.asarray(res.ll)
    t = time.perf_counter() - t0
    iters = np.asarray(res.n_iters)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "restarts": args.restarts,
        "wall_s": round(t, 3),
        "iters_median": float(np.median(iters)),
        "iters_p90": float(np.percentile(iters, 90)),
        "iters_max": int(iters.max()),
        "best_ll": [float(x) for x in np.nanmax(
            np.where(np.isfinite(ll), ll, np.nan), axis=0)],
    }))


if __name__ == "__main__":
    main()
