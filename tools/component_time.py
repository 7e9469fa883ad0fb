"""Per-component CAVI cost, measured with N chained evaluations per dispatch.

Each component is looped inside one jitted fori_loop with its output fed
back into the next evaluation (no DCE), so the remote tunnel's ~28 ms
dispatch floor divides away. Components are timed at the benchmark shape
(R restarts x 560 docs, BRCA-EU data) in the same vmapped form the real
fit uses.
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
    ap.add_argument("--chain", type=int, default=30)
    args = ap.parse_args()
    R, CH = args.restarts, args.chain

    from bench import load_counts_np
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import (
        calculate_Ndivzeta,
        calculate_sumtheta,
        counts_per_doc,
        solve_lambda,
        solve_nu,
        update_Sigma_mats,
    )
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha

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

    # advance a few iterations so shapes/values are realistic mid-fit
    step = mmod.fit_step_fn(X, N, config)
    warm = jax.jit(jax.vmap(lambda s: jax.lax.fori_loop(
        0, 20, lambda _, c: step(c[0]), (s, jnp.zeros((config.M,), jnp.float32))
    )[0]))
    states = warm(states)
    jax.block_until_ready(states)

    def timed(label, fn):
        """fn: state -> scalar-ish pytree; chained via a running checksum."""

        @jax.jit
        def run(states):
            def one(s):
                def body(i, acc):
                    out = fn(s, acc)
                    return jax.tree_util.tree_reduce(
                        lambda a, x: a + jnp.sum(x) * 1e-20, out, acc
                    )

                return jax.lax.fori_loop(0, CH, body, jnp.float32(0.0))

            return jax.vmap(one)(states)

        out = run(states)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(states))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:<26s} {best / CH * 1e3:8.3f} ms/eval")

    zeta0 = jax.vmap(lambda s: mmod.update_zeta(s, config))(states)
    ndz0 = jax.vmap(lambda z: calculate_Ndivzeta(N, z, config))(zeta0)

    print(f"platform={jax.devices()[0].platform} R={R} chain={CH}")
    timed("full step", lambda s, acc: step(s._replace(lam=s.lam + acc))[1])
    timed("zeta+Ndivzeta", lambda s, acc: calculate_Ndivzeta(
        N, mmod.update_zeta(s._replace(lam=s.lam + acc), config), config))
    timed("theta+sumtheta", lambda s, acc: calculate_sumtheta(
        mmod.theta_from(s.lam + acc, mmod.smoothed_logw(s), config), X, config))
    from multimodalmusig_tpu.models.ctm_base import theta_moments
    timed("theta moments (factorized)", lambda s, acc: theta_moments(
        s.lam + acc, mmod.smoothed_logw(s), X, config)[0])
    timed("theta scatter (materialized)", lambda s, acc: mmod.update_gamma(
        s._replace(lam_pre=s.lam_pre + acc), X, config,
        theta=mmod.reconstruct_theta(s._replace(lam_pre=s.lam_pre + acc), config),
    ).gamma)
    timed("nu solve", lambda s, acc: solve_nu(
        s.nu + acc, s.lam, ndz0[0], s.invSigma))
    timed("lambda solve", lambda s, acc: solve_lambda(
        s.lam + acc, s.nu, ndz0[0], jnp.full_like(s.lam, 3.0), s.mu, s.invSigma))
    timed("update_gamma+Elnphi", lambda s, acc: mmod.update_gamma(
        s._replace(lam_pre=s.lam_pre + acc), X, config).gamma)
    timed("mu+Sigma+inv", lambda s, acc: update_Sigma_mats(
        s.lam + acc, s.nu, s.mu, config.D))
    timed("modality ll", lambda s, acc: mmod.modality_loglikelihoods(
        X, mmod.props_from(s.lam + acc, config), mmod.phi_point(s.gamma)))


if __name__ == "__main__":
    main()
