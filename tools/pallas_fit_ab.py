"""A/B the full 100-restart benchmark fit with/without the fused λ kernel.

Checks that the Pallas path (a) compiles under the vmapped-restart program
(per-lane μ/Σ⁻¹ — exercises pallas_call's batching rule), (b) agrees with
the XLA path, and (c) is faster end-to-end.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(arm, restarts):
    # arm0 = pure XLA, arm1 = fused lambda kernel. (An arm2 measured the
    # now-demoted fused E-step kernel before round 5 removed its gate: at
    # the cg=4 operating point it lost outright — 0.48 s vs 0.44 s XLA vs
    # 0.36 s lambda-only on the R=100 BRCA fit, BENCH_LOCAL pallas_ab_r5 —
    # and the kernel lives on in tools/pallas_experiments/estep_kernel.py.)
    # Env gates are trace-time, so each arm is its own subprocess.
    # arm2 = XLA with the solver inner loops UNROLLED at trace time instead
    # of lowered to While ops (ops/solvers.py _loop). Measured round 5:
    # unrolling LOSES 1.6x end-to-end (0.57 s vs arm0's 0.36 s at R=100) —
    # XLA schedules the compact While bodies better than the straight-line
    # graph — which is why _UNROLL_DEFAULT is False. The flip is trace-time,
    # so setting it before any trace in this subprocess is a sound arm.
    os.environ["MUSIG_PALLAS"] = "1" if arm == "arm1" else "0"
    import jax
    import jax.numpy as jnp

    if arm == "arm2":
        from multimodalmusig_tpu.ops import solvers

        solvers._UNROLL_DEFAULT = True

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
    res = fit_restarts(key, X, config, alpha, **kwargs)  # warm/compile
    ll = np.asarray(res.ll)
    t0 = time.perf_counter()
    res = fit_restarts(key, X, config, alpha, **kwargs)
    ll = np.asarray(res.ll)
    t = time.perf_counter() - t0
    return t, ll, np.asarray(res.n_iters)


def main():
    # Each arm runs in its own subprocess: jax.jit caches compiled executables
    # by trace, and the MUSIG_PALLAS gate is evaluated at trace time — a
    # same-process A/B silently reuses the first arm's executable.
    if len(sys.argv) > 2 and sys.argv[2] in ("arm0", "arm1", "arm2"):
        t, ll, it = run(sys.argv[2], int(sys.argv[1]))
        np.savez(f"/tmp/pallas_ab_{sys.argv[2]}.npz", t=t, ll=ll, it=it)
        return

    import subprocess

    restarts = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    arms = ("arm0", "arm1", "arm2")
    for arm in arms:
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(restarts), arm],
            check=True,
        )
    a0 = np.load("/tmp/pallas_ab_arm0.npz")
    a1 = np.load("/tmp/pallas_ab_arm1.npz")
    a2 = np.load("/tmp/pallas_ab_arm2.npz")
    t0, ll0, it0 = float(a0["t"]), a0["ll"], a0["it"]
    t1, ll1, it1 = float(a1["t"]), a1["ll"], a1["it"]
    t2 = float(a2["t"])
    print(f"xla (unrolled): {t0:.2f}s  ({restarts / t0:.1f} restarts/s)")
    print(f"xla (fori)    : {t2:.2f}s  ({restarts / t2:.1f} restarts/s)  "
          f"unroll speedup {t2 / t0:.2f}x")
    print(f"pallas: {t1:.2f}s  ({restarts / t1:.1f} restarts/s)  speedup {t0 / t1:.2f}x")
    print(f"iters equal: {np.array_equal(it0, it1)}  "
          f"(med {np.median(it0):.0f} vs {np.median(it1):.0f})")
    finite = np.isfinite(ll0) & np.isfinite(ll1)
    print(f"max |ll diff| (finite lanes): {np.abs(ll0 - ll1)[finite].max():.3e}; "
          f"finite {finite.all(axis=1).sum()}/{restarts} vs "
          f"{np.isfinite(ll1).all(axis=1).sum()}/{restarts}")


if __name__ == "__main__":
    main()
