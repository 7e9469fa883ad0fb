"""On-device profiling harness for the hot kernels (run when a TPU is attached).

    python tools/profile_kernels.py [--trace-dir /tmp/musig_trace]

Times each CAVI component at flagship batch sizes, A/Bs the fused Pallas λ
kernel against the XLA path, and (optionally) captures a jax.profiler trace
for timeline inspection. Written as a tool (not a test) because it needs the
real accelerator; see NOTES.md for the current findings it should extend.
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # warm + materialize
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--restarts", type=int, default=100)
    args = ap.parse_args()

    from bench import load_counts
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import counts_per_doc
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha
    from multimodalmusig_tpu.ops.pallas.lambda_kernel import maximize_lambda_fused
    from multimodalmusig_tpu.ops.solvers import maximize_lambda, maximize_nu

    R = args.restarts
    config = MMCTMConfig(K=(7, 7), V=(96, 48), D=560, dtype=jnp.float32)
    X = tuple(jnp.asarray(x, jnp.float32) for x in load_counts())
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    keys = jax.random.split(jax.random.key(0), R)
    states = jax.vmap(lambda k: init_with_alpha(k, config, X, alpha))(keys)
    N = counts_per_doc(X)

    def checksum(f):
        return jax.jit(
            lambda *a: jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x), f(*a), 0.0
            )
        )

    step = mmod.fit_step_fn(X, N, config)
    print(f"full CAVI iteration (R={R}):",
          f"{timeit(checksum(jax.vmap(step)), states):.4f}s")
    print("theta:", f"{timeit(checksum(jax.vmap(lambda s: mmod.update_theta(s, config))), states):.4f}s")

    B, MK = R * 560, config.MK
    lam = states.lam.reshape(B, MK)
    nu = states.nu.reshape(B, MK)
    ndz = jnp.full((B, MK), 3.0)
    st = jnp.full((B, MK), 2.0)
    mu = jnp.zeros(MK, jnp.float32)
    invS = jnp.eye(MK, dtype=jnp.float32) + 0.01
    print("nu solve:", f"{timeit(checksum(maximize_nu), nu, lam, ndz, jnp.ones_like(lam)):.4f}s")
    print("lambda jnp:", f"{timeit(checksum(maximize_lambda), lam, nu, ndz, st, mu, invS):.4f}s")
    print("lambda pallas:", f"{timeit(checksum(maximize_lambda_fused), lam, nu, ndz, st, mu, invS):.4f}s")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.tree_util.tree_map(np.asarray, jax.jit(jax.vmap(step))(states))
            np.asarray(maximize_lambda_fused(lam, nu, ndz, st, mu, invS))
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
