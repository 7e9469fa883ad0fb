"""A/B the fused Pallas λ kernel vs the XLA path, on device, honestly.

Chains N solves inside one jitted call (each feeding the next so nothing is
dead-code-eliminated), so the remote tunnel's ~28 ms per-dispatch floor
cannot drown the measurement. Also checks the two paths agree numerically.
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
    ap.add_argument("--B", type=int, default=56000)
    ap.add_argument("--MK", type=int, default=14)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    from multimodalmusig_tpu.ops.pallas.lambda_kernel import maximize_lambda_fused
    from multimodalmusig_tpu.ops.solvers import maximize_lambda

    B, MK = args.B, args.MK
    rng = np.random.default_rng(0)
    lam = jnp.asarray(rng.standard_normal((B, MK)), jnp.float32)
    nu = jnp.asarray(rng.uniform(0.01, 1.0, (B, MK)), jnp.float32)
    ndz = jnp.asarray(rng.uniform(0.5, 5.0, (B, MK)), jnp.float32)
    st = jnp.asarray(rng.uniform(0.0, 30.0, (B, MK)), jnp.float32)
    mu = jnp.zeros((MK,), jnp.float32)
    A = rng.standard_normal((MK, MK)).astype(np.float32)
    S = A @ A.T + 0.05 * np.eye(MK, dtype=np.float32)
    invS = jnp.asarray(np.linalg.inv(S))

    def chained(solver):
        @jax.jit
        def run(lam):
            def body(_, l):
                out = solver(l, nu, ndz, st, mu, invS)
                # feed back a perturbed start so every solve does real work
                return 0.5 * l + 0.01 * out

            return jax.lax.fori_loop(0, args.chain, body, lam)

        return run

    def timeit(f, x, reps=3):
        out = f(x)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_jnp, o_jnp = timeit(chained(maximize_lambda), lam)
    t_pal, o_pal = timeit(chained(maximize_lambda_fused), lam)
    dev = float(jnp.max(jnp.abs(o_jnp - o_pal)))
    per_jnp = t_jnp / args.chain * 1e3
    per_pal = t_pal / args.chain * 1e3
    print(f"platform={jax.devices()[0].platform} B={B} MK={MK} chain={args.chain}")
    print(f"xla   : {per_jnp:8.3f} ms/solve")
    print(f"pallas: {per_pal:8.3f} ms/solve  (speedup {per_jnp / per_pal:.2f}x)")
    print(f"max |diff| between paths: {dev:.3e}")


if __name__ == "__main__":
    main()
