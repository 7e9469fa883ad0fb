"""Is the θ path worth fusing? Chained timing of the θ-dependent piece
(softmax + sumθ + γ scatter + ll) vs the full CAVI step, vmapped at R."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    R, CH = 100, 10
    from bench import load_counts_np
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import calculate_sumtheta, counts_per_doc
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
    step = mmod.fit_step_fn(X, N, config)

    def theta_piece(s, acc):
        lam = s.lam + acc
        logw = mmod.smoothed_logw(s)
        theta = mmod.theta_from(lam, logw, config)
        st = calculate_sumtheta(theta, X, config)
        s2 = mmod.update_gamma(s._replace(lam_pre=lam, logw_pre=logw), X, config, theta)
        ll = mmod.modality_loglikelihoods(
            X, mmod.props_from(lam, config), mmod.phi_point(s2.gamma)
        )
        return st.sum() + ll.sum()

    def full_piece(s, acc):
        s2, ll = step(s._replace(lam=s.lam + acc))
        return s2.lam.sum() * 1e-20 + ll.sum()

    def timed(label, fn):
        @jax.jit
        def run(states):
            def one(s):
                return jax.lax.fori_loop(
                    0, CH, lambda i, acc: 1e-20 * fn(s, acc), jnp.float32(0.0)
                )

            return jax.vmap(one)(states)

        out = run(states)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(states))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:<28s} {best / CH * 1e3:8.3f} ms/eval")

    print(f"platform={jax.devices()[0].platform} R={R} chain={CH}")
    timed("theta path (softmax/st/gamma/ll)", theta_piece)
    timed("full CAVI step", full_piece)


if __name__ == "__main__":
    main()
