"""Time the chunked restart driver's pieces: where does bench wall-clock go?

Times (warm): one _advance_carries chunk at full batch, the host compaction
round-trip, and a full fit_restarts, then reconciles against the
per-iteration device time from tools/iter_time.py.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import load_counts_np
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig
    from multimodalmusig_tpu.parallel import restarts as rmod

    R = 100
    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    key = jax.random.key(147959412)
    keys = jax.random.split(key, R)

    MAXITER, TOL, CHUNK = 1000, 1e-5, 50

    carries = rmod._init_carries(keys, X, config, alpha, MAXITER)
    jax.block_until_ready(carries)

    # warm one chunk
    adv = lambda c: rmod._advance_carries(c, X, config, MAXITER, TOL, CHUNK)
    c1 = adv(carries)
    jax.block_until_ready(c1)
    t0 = time.perf_counter()
    c1 = adv(carries)
    jax.block_until_ready(c1)
    t_chunk = time.perf_counter() - t0
    print(f"one chunk ({CHUNK} iters, batch {R}): {t_chunk*1e3:.1f} ms "
          f"-> {t_chunk/CHUNK*1e3:.2f} ms/batched-iter")

    # full fit, warm (bench warms identically)
    np.asarray(rmod.fit_restarts(key, X, config, alpha, restarts=R,
                                 maxiter=MAXITER, tol=TOL, chunk_iters=CHUNK).ll)
    t0 = time.perf_counter()
    res = rmod.fit_restarts(key, X, config, alpha, restarts=R,
                            maxiter=MAXITER, tol=TOL, chunk_iters=CHUNK)
    ll = np.asarray(res.ll)
    t_fit = time.perf_counter() - t0
    iters = np.asarray(res.n_iters)
    print(f"full fit_restarts: {t_fit:.2f} s; iters min/med/max = "
          f"{iters.min()}/{np.median(iters):.0f}/{iters.max()}; "
          f"sum lane-iters = {iters.sum()}")

    # no-chunk variant for comparison (single while_loop to completion)
    np.asarray(rmod.fit_restarts(key, X, config, alpha, restarts=R,
                                 maxiter=MAXITER, tol=TOL).ll)
    t0 = time.perf_counter()
    res2 = rmod.fit_restarts(key, X, config, alpha, restarts=R,
                             maxiter=MAXITER, tol=TOL)
    np.asarray(res2.ll)
    t_nochunk = time.perf_counter() - t0
    print(f"full fit_restarts (no chunking): {t_nochunk:.2f} s")


if __name__ == "__main__":
    main()
