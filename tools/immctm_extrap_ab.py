"""A/B the secant-extrapolated λ warm start on IMMCTM restart fits.

IMMCTM is the slowest-converging family on BRCA (iteration p50 ~207 vs
MMCTM's ~133 — BENCH_LOCAL immctm_iter_probe_r5), so the extrapolation
has the most outer iterations to save there. Same methodology as
tools/lambda_extrap_ab.py (interleaved arms, static-config jit args,
population quality gates); the fit path is the production _FamilyRunner
the fitters use, with the config's lambda_extrap overridden per arm.

    python tools/immctm_extrap_ab.py            # arms: off, 1.0, 0.5
    python tools/immctm_extrap_ab.py 0.0 1.5    # explicit coefficients
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    import jax
    import pandas as pd

    import multimodalmusig_tpu as mm
    from multimodalmusig_tpu.models.immctm import IMMCTM
    from multimodalmusig_tpu.parallel import restarts as pr
    from multimodalmusig_tpu.utils.data import brca_counts_path

    snv = pd.read_csv(brca_counts_path("brca-eu_snv_counts.tsv"), sep="\t")
    sv = pd.read_csv(brca_counts_path("brca-eu_sv_counts.tsv"), sep="\t")
    cols = list(snv.columns[1:])
    X_mm = mm.format_counts_mmctm([snv, sv], cols)
    # substitution x trinucleotide-context factorization for SNV, type x
    # size/region for SV — matches tools/families_bench.py
    terms = snv["term"].tolist()
    subs = sorted({t.split("[")[1].split("]")[0] for t in terms})
    ctx = sorted({t.split("[")[0] + "_" + t.split("]")[1] for t in terms})
    feats = np.array([[subs.index(t.split("[")[1].split("]")[0]) + 1,
                       ctx.index(t.split("[")[0] + "_" + t.split("]")[1]) + 1]
                      for t in terms])
    sv_terms = sv["term"].tolist()
    svt = sorted({t.split(":")[0] for t in sv_terms})
    svr = sorted({":".join(t.split(":")[1:]) for t in sv_terms})
    feats_sv = np.array([[svt.index(t.split(":")[0]) + 1,
                          svr.index(":".join(t.split(":")[1:])) + 1]
                         for t in sv_terms])

    restarts = 100
    model = IMMCTM([7, 7], [0.1, 0.1], [feats, feats_sv], X_mm)
    keys = jax.random.split(jax.random.key(147959412), restarts)
    arms = [None if a in ("None", "0.0", "0") else float(a)
            for a in (argv or ["None", "1.0", "0.5"])]

    def timed(c):
        cfg = dataclasses.replace(model.config, lambda_extrap=c)
        run = pr._FamilyRunner(
            pr._immctm_restarts_from_keys, model.Xdense, model.F,
            model.state.alpha, config=cfg, maxiter=1000, tol=1e-5,
        )
        t0 = time.perf_counter()
        r = run(keys)
        # np.asarray (device_get) as the barrier. A block_until_ready arm
        # here once read 0.0 and was blamed on the axon backend; the direct
        # measurement (tools/sync_check.py) shows block IS a compute
        # barrier on arrays — the 0.0 came from blocking on a result pytree
        # whose leaves were already host-side. Fetching the small ll array
        # is correct either way (compute + a few-KB transfer).
        np.asarray(r.ll)
        return time.perf_counter() - t0, r

    for c in arms:  # compile every arm first
        timed(c)
    results = {str(c): [] for c in arms}
    last = {}
    for _ in range(3):
        for c in arms:
            t, r = timed(c)
            results[str(c)].append(round(t, 3))
            last[str(c)] = r
    for c in arms:
        r = last[str(c)]
        ll = np.asarray(r.ll)
        it = np.asarray(r.n_iters)
        fin = np.isfinite(ll).all(axis=1)
        print(json.dumps({
            "extrap": c, "wall_s": results[str(c)],
            "iters_median": int(np.median(it)), "iters_max": int(it.max()),
            "finite": int(fin.sum()),
            "best_ll": [float(v) for v in ll.max(axis=0)],
            "mean_ll": [float(v) for v in ll[fin].mean(axis=0)],
            "sem_ll": [float(v) for v in ll[fin].std(axis=0) / np.sqrt(fin.sum())],
        }))


if __name__ == "__main__":
    main(sys.argv[1:])
