"""Diagnostic: how many of the benchmark's restart lanes end with NaN ll?

Runs the exact bench.py workload (R vmapped MMCTM([7,7]) restarts on BRCA-EU
SNV+SV, tol=1e-5) and reports per-lane finiteness, iteration counts, and the
ll spread of finite lanes. NaN lanes are masked out of model selection
(parallel/restarts.py pick_*), but every NaN lane is a wasted restart — this
tool quantifies the loss so solver-robustness work can be judged.
"""

import os
import sys
import time

import numpy as np
from multimodalmusig_tpu.utils.data import brca_counts_path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(restarts=100, dtype="float32", platform=None):
    if platform == "cpu":
        from multimodalmusig_tpu.utils.hermetic import force_cpu

        force_cpu()
    import jax
    import jax.numpy as jnp

    from multimodalmusig_tpu.models.mmctm import MMCTMConfig
    from multimodalmusig_tpu.parallel.restarts import fit_restarts
    from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv

    dt = jnp.float32 if dtype == "float32" else jnp.float64
    Xnp = []
    for fname in ("brca-eu_snv_counts.tsv", "brca-eu_sv_counts.tsv"):
        counts, _, _ = read_counts_tsv(brca_counts_path(fname))
        Xnp.append(counts.T)
    D = Xnp[0].shape[0]
    config = MMCTMConfig(K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=D, dtype=dt)
    X = tuple(jnp.asarray(x, dt) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], dt)

    key = jax.random.key(147959412)
    t0 = time.perf_counter()
    result = fit_restarts(
        key, X, config, alpha, restarts=restarts, maxiter=1000, tol=1e-5,
        chunk_iters=50,
    )
    ll = np.asarray(result.ll)
    t = time.perf_counter() - t0
    iters = np.asarray(result.n_iters)
    lam = np.asarray(result.state.lam)
    nu = np.asarray(result.state.nu)

    finite = np.isfinite(ll).all(axis=1)
    print(f"platform={jax.devices()[0].platform} dtype={dtype} R={restarts} t={t:.1f}s")
    print(f"finite lanes: {finite.sum()}/{restarts}")
    print(f"iters: min={iters.min()} med={np.median(iters):.0f} max={iters.max()}")
    if finite.any():
        fll = ll[finite]
        print(f"finite ll best={fll.max(axis=0)} worst={fll.min(axis=0)}")
    bad = np.nonzero(~finite)[0]
    if len(bad):
        print(f"NaN lanes: {bad.tolist()[:20]}")
        for b in bad[:5]:
            print(
                f"  lane {b}: iters={iters[b]} "
                f"lam finite={np.isfinite(lam[b]).all()} "
                f"max|lam|={np.nanmax(np.abs(lam[b])):.3g} "
                f"nu finite={np.isfinite(nu[b]).all()} "
                f"max nu={np.nanmax(nu[b]):.3g} min nu={np.nanmin(nu[b]):.3g}"
            )


if __name__ == "__main__":
    kwargs = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        kwargs[k] = v
    main(
        restarts=int(kwargs.get("restarts", 100)),
        dtype=kwargs.get("dtype", "float32"),
        platform=kwargs.get("platform"),
    )
