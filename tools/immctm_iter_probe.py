"""IMMCTM restart-scale cost split: per-iteration device time vs
iteration-count distribution (the two factors of the families_bench wall).

Methodology matches tools/iter_time.py (fori_loop over full CAVI
iterations inside ONE executable; difference of two iteration counts
isolates device time — the tunnel adds ~28 ms per dispatch) plus one
production best-of-N fit to read the n_iters distribution at the bench
configuration (tol=1e-5, maxiter=1000). MMCTM numbers at the same K for
scale. Records immctm_iter_probe_r5 in BENCH_LOCAL.json unless
--no-record.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def load_brca():
    import pandas as pd

    import multimodalmusig_tpu as mm
    from multimodalmusig_tpu.utils.data import brca_counts_path

    snv = pd.read_csv(brca_counts_path("brca-eu_snv_counts.tsv"), sep="\t")
    sv = pd.read_csv(brca_counts_path("brca-eu_sv_counts.tsv"), sep="\t")
    cols = list(snv.columns[1:])
    X_mm = mm.format_counts_mmctm([snv, sv], cols)

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
    return X_mm, [feats, feats_sv]


def timed_loop(step, states, n, M, reps):
    def run_iters(s, n_iters):
        def body(_, carry):
            st, _ = carry
            return step(st)

        return jax.lax.fori_loop(
            0, n_iters, body, (s, jnp.zeros((M,), jnp.float32))
        )

    # n is closed over: two n values = two executables, as intended
    f = jax.jit(jax.vmap(lambda s: run_iters(s, n)))
    out = f(states)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(states))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    from multimodalmusig_tpu.models import immctm as imod
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import counts_per_doc
    from multimodalmusig_tpu.models.ilda import feature_onehots
    from multimodalmusig_tpu.models.immctm import IMMCTM
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha

    R = args.restarts
    X_list, feats = load_brca()
    out = {"platform": jax.devices()[0].platform, "restarts": R,
           "iters": args.iters, "tol": args.tol}

    # --- per-iteration device time, IMMCTM vs MMCTM at the same K -------
    wrapper = IMMCTM([7, 7], [0.1, 0.1], feats, X_list)
    cfg, Xd, F = wrapper.config, wrapper.Xdense, wrapper.F
    N = counts_per_doc(Xd)
    alpha_full = tuple(
        jnp.full((i,), 0.1, cfg.dtype) for i in cfg.I
    )
    keys = jax.random.split(jax.random.key(0), R)

    def init_imm(k):
        st = imod.init(k, cfg, [np.zeros(i) for i in cfg.I])
        return st._replace(alpha=alpha_full)

    states_imm = jax.vmap(init_imm)(keys)
    step_imm = imod.fit_step_fn(Xd, N, F, cfg)

    n1, n2 = args.iters, 2 * args.iters
    t1 = timed_loop(step_imm, states_imm, n1, cfg.M, args.reps)
    t2 = timed_loop(step_imm, states_imm, n2, cfg.M, args.reps)
    per_iter_imm = (t2 - t1) / (n2 - n1)
    out["immctm_per_iter_ms"] = round(per_iter_imm * 1e3, 3)
    print(f"IMMCTM per-iteration: {per_iter_imm*1e3:.3f} ms "
          f"(t{n1}={t1*1e3:.0f} t{n2}={t2*1e3:.0f})")

    mcfg = MMCTMConfig(K=cfg.K, V=cfg.V, D=cfg.D, dtype=jnp.float32)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    states_mm = jax.vmap(lambda k: init_with_alpha(k, mcfg, Xd, alpha))(keys)
    step_mm = mmod.fit_step_fn(Xd, N, mcfg)
    t1m = timed_loop(step_mm, states_mm, n1, mcfg.M, args.reps)
    t2m = timed_loop(step_mm, states_mm, n2, mcfg.M, args.reps)
    per_iter_mm = (t2m - t1m) / (n2 - n1)
    out["mmctm_per_iter_ms"] = round(per_iter_mm * 1e3, 3)
    out["iter_cost_ratio"] = round(per_iter_imm / per_iter_mm, 2)
    print(f"MMCTM  per-iteration: {per_iter_mm*1e3:.3f} ms "
          f"(ratio {out['iter_cost_ratio']}x)")

    # --- iteration distribution at the bench configuration --------------
    @jax.jit
    def run(keys):
        return jax.vmap(
            lambda k: imod.fit(init_imm(k), Xd, F, cfg, maxiter=1000,
                               tol=args.tol)
        )(keys)

    result = run(keys)
    iters = np.asarray(jax.device_get(result.n_iters))
    out["n_iters"] = {
        "p50": int(np.percentile(iters, 50)),
        "p90": int(np.percentile(iters, 90)),
        "p99": int(np.percentile(iters, 99)),
        "max": int(iters.max()),
        "mean": round(float(iters.mean()), 1),
    }
    print("IMMCTM n_iters:", json.dumps(out["n_iters"]))
    print(json.dumps(out))

    if not args.no_record:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_LOCAL.json")
        with open(path) as f:
            data = json.load(f)
        data["immctm_iter_probe_r5"] = out
        with open(path, "w") as f:
            json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
