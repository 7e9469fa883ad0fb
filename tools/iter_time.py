"""True on-device CAVI iteration cost: N iterations inside ONE device call.

The remote-TPU tunnel adds ~28 ms per dispatch, so timing a single jitted
step measures the tunnel, not the chip. Here `lax.fori_loop` runs ITERS full
CAVI iterations (R vmapped restarts) inside one executable; the difference
between ITERS=a and ITERS=b isolates per-iteration device time.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import load_counts_np
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import counts_per_doc
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha

    R = args.restarts
    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    keys = jax.random.split(jax.random.key(0), R)
    states = jax.vmap(lambda k: init_with_alpha(k, config, X, alpha))(keys)
    N = counts_per_doc(X)
    step = mmod.fit_step_fn(X, N, config)

    def run_iters(states, n_iters):
        def body(_, carry):
            s, _ = carry
            return step(s)

        return jax.lax.fori_loop(0, n_iters, body, (states, jnp.zeros((config.M,), jnp.float32)))

    def timed(n):
        f = jax.jit(jax.vmap(lambda s: run_iters(s, n)))
        out = f(states)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(states))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = args.iters, 2 * args.iters
    t1, t2 = timed(n1), timed(n2)
    per_iter = (t2 - t1) / (n2 - n1)
    print(f"platform={jax.devices()[0].platform} R={R}")
    print(f"t({n1} iters)={t1*1e3:.1f} ms  t({n2} iters)={t2*1e3:.1f} ms")
    print(f"per-iteration device time: {per_iter*1e3:.3f} ms "
          f"({per_iter*1e6/R:.2f} us/restart-iteration)")


if __name__ == "__main__":
    main()
