"""Benchmark: the BASELINE.md north-star workload.

Fits R=100 vmapped MMCTM([7,7], α=0.1) restarts on the bundled BRCA-EU
SNV+SV cohort (560 samples; the reference README's flagship workload,
README.md:20-42) to tol=1e-5 on the default accelerator, and compares
against the reference's unit of work: ONE single-restart fit on one CPU
(the reference is single-threaded Julia on CPU; its restarts scale linearly
with processes, ours ride a single compiled vmap).

Prints ONE JSON line:
  {"metric": "mmctm_restarts_per_sec_brca_tol1e-5", "value": R/t_accel,
   "unit": "restarts/s", "vs_baseline": (R/t_accel)/(1/t_cpu_single)}

vs_baseline > 1 means the north-star target is beaten: 100 restarts in less
wall-clock than one CPU restart implies vs_baseline >= 100.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


RESTARTS = 100
TOL = 1e-5
MAXITER = 1000


def load_counts():
    from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv

    data_dir = "/root/reference/data"
    if not os.path.isdir(data_dir):
        data_dir = os.path.join(os.path.dirname(__file__), "data")
    rows = []
    for fname in ("brca-eu_snv_counts.tsv", "brca-eu_sv_counts.tsv"):
        counts, _, _ = read_counts_tsv(os.path.join(data_dir, fname))
        rows.append(counts.T)  # (D, V)
    return rows


def main():
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha
    from multimodalmusig_tpu.models import mmctm as mmctm_mod
    from multimodalmusig_tpu.parallel.restarts import fit_restarts

    Xnp = load_counts()
    D = Xnp[0].shape[0]
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=D, dtype=jnp.float32
    )
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)

    # --- accelerated: R restarts in one compiled vmap on the default device.
    # Warm up with the *same* program (maxiter is a static arg, so a smaller
    # warmup would compile a different executable and the timed run would pay
    # cold-start costs).
    # chunk_iters keeps each device execution bounded (long single executions
    # can crash the remote-attached TPU worker).
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    key = jax.random.key(147959412)
    CHUNK = 50
    np.asarray(
        fit_restarts(
            key, X, config, alpha, restarts=RESTARTS, maxiter=MAXITER, tol=TOL,
            chunk_iters=CHUNK,
        ).ll
    )
    t0 = time.perf_counter()
    result = fit_restarts(
        key, X, config, alpha, restarts=RESTARTS, maxiter=MAXITER, tol=TOL,
        chunk_iters=CHUNK,
    )
    ll = np.asarray(result.ll)
    t_accel = time.perf_counter() - t0
    iters = np.asarray(result.n_iters)

    # --- baseline: ONE restart on one CPU device (the reference's unit of work)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        Xc = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
        state = init_with_alpha(jax.random.key(0), config, Xc, alpha)
        fit_cpu = jax.jit(
            mmctm_mod.fit, static_argnames=("config", "maxiter", "tol")
        )
        np.asarray(fit_cpu(state, Xc, config, maxiter=MAXITER, tol=TOL).ll)
        t0 = time.perf_counter()
        res_cpu = fit_cpu(state, Xc, config, maxiter=MAXITER, tol=TOL)
        np.asarray(res_cpu.ll)
        t_cpu = time.perf_counter() - t0

    value = RESTARTS / t_accel
    baseline = 1.0 / t_cpu
    print(
        json.dumps(
            {
                "metric": "mmctm_restarts_per_sec_brca_tol1e-5",
                "value": round(value, 4),
                "unit": "restarts/s",
                "vs_baseline": round(value / baseline, 4),
            }
        )
    )
    # diagnostics on stderr (driver reads stdout's single JSON line)
    print(
        f"accel: {RESTARTS} restarts in {t_accel:.2f}s "
        f"(iters median {int(np.median(iters))}, best ll {ll.max(axis=0)}); "
        f"cpu single restart: {t_cpu:.2f}s ({int(res_cpu.n_iters)} iters)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
