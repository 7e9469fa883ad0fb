"""On-device profiling harness for the hot kernels (run when a TPU is attached).

    python tools/profile_kernels.py [--trace-dir /tmp/musig_trace]

Times each CAVI component at flagship batch sizes (R vmapped restarts of
MMCTM([7,7]) on BRCA-EU-shaped data), A/Bs the fused Pallas λ kernel against
the XLA path, and (optionally) captures a jax.profiler trace for timeline
inspection. Written as a tool (not a test) because it needs the real
accelerator; see NOTES.md for the current findings it should extend.
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


def timeit(fn, *args, reps=5):
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

    from bench import load_counts_np
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import (
        calculate_Ndivzeta,
        calculate_sumtheta,
        counts_per_doc,
        update_Sigma_mats,
    )
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha
    from multimodalmusig_tpu.ops.pallas.lambda_kernel import maximize_lambda_fused
    from multimodalmusig_tpu.ops.solvers import maximize_lambda, maximize_nu

    R = args.restarts
    config = MMCTMConfig(K=(7, 7), V=(96, 48), D=560, dtype=jnp.float32)
    X = tuple(jnp.asarray(x, jnp.float32) for x in load_counts_np())
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
    t_step = timeit(checksum(jax.vmap(step)), states)
    print(f"full CAVI iteration (R={R}): {t_step * 1e3:9.2f} ms")

    # -- component timings (all vmapped over R like the real step) --
    def comp(label, f):
        t = timeit(checksum(jax.vmap(f)), states)
        print(f"  {label:<28s} {t * 1e3:9.2f} ms")

    comp("e_step (zeta/theta/nu/lam)", lambda s: mmod.e_step(s, X, N, config)[0])
    comp("theta softmax only", lambda s: mmod.update_theta(s, config))
    comp("theta+sumtheta", lambda s: calculate_sumtheta(mmod.update_theta(s, config), X, config))
    comp(
        "nu solve",
        lambda s: maximize_nu(
            s.nu,
            s.lam,
            calculate_Ndivzeta(N, s.zeta, config),
            jnp.diagonal(s.invSigma)[None, :],
        ),
    )
    comp(
        "lambda solve",
        lambda s: maximize_lambda(
            s.lam,
            s.nu,
            calculate_Ndivzeta(N, s.zeta, config),
            calculate_sumtheta(mmod.update_theta(s, config), X, config),
            s.mu,
            s.invSigma,
        ),
    )
    comp("update_gamma (+Elnphi)", lambda s: mmod.update_gamma(s, X, config))
    comp("mu+Sigma", lambda s: update_Sigma_mats(s.lam, s.nu, s.mu, config.D))
    comp(
        "modality ll",
        lambda s: mmod.modality_loglikelihoods(
            X, mmod.props_from(s.lam, config), mmod.phi_point(s.gamma)
        ),
    )

    # -- flat-batch solver A/B (R*D documents in one (B, MK) batch) --
    B, MK = R * 560, config.MK
    lam = states.lam.reshape(B, MK)
    nu = states.nu.reshape(B, MK)
    ndz = jnp.full((B, MK), 3.0)
    st = jnp.full((B, MK), 2.0)
    mu = jnp.zeros(MK, jnp.float32)
    invS = jnp.eye(MK, dtype=jnp.float32) + 0.01
    print(f"flat-batch solves (B={B}):")
    print(f"  nu solve      {timeit(checksum(maximize_nu), nu, lam, ndz, jnp.ones_like(lam)) * 1e3:9.2f} ms")
    print(f"  lambda jnp    {timeit(checksum(maximize_lambda), lam, nu, ndz, st, mu, invS) * 1e3:9.2f} ms")
    try:
        print(f"  lambda pallas {timeit(checksum(maximize_lambda_fused), lam, nu, ndz, st, mu, invS) * 1e3:9.2f} ms")
    except Exception as e:
        print(f"  lambda pallas FAILED: {type(e).__name__}: {e}")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            jax.tree_util.tree_map(np.asarray, jax.jit(jax.vmap(step))(states))
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
