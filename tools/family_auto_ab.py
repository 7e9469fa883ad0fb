"""Same-process A/B of the family fitters' plain vs auto-compaction paths,
with host-phase breakdown (trace/lower/compile vs execute).

Motivation: one-shot walls from separate processes disagreed wildly
(families_bench_r5 vs a same-day re-run: LDA 7.3 vs 1.78 s), and the
auto arm measured SLOWER than plain for LDA/ILDA — suspected per-call
host overhead (each fit_*_restarts call re-traces its closures; the auto
path additionally AOT-lowers the pilot and traces the rest-shape). This
tool times N repeated calls per arm in ONE process and, separately,
breaks a single LDA call into trace+lower / compile / execute phases.
Records family_auto_ab_r5 in BENCH_LOCAL.json unless --no-record.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--maxiter", type=int, default=1000)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    import pandas as pd

    import multimodalmusig_tpu as mm
    from multimodalmusig_tpu.parallel.restarts import (
        fit_ilda_restarts,
        fit_immctm_restarts,
        fit_lda_restarts,
        fit_mmctm_restarts,
    )
    from multimodalmusig_tpu.utils.data import brca_counts_path

    snv = pd.read_csv(brca_counts_path("brca-eu_snv_counts.tsv"), sep="\t")
    sv = pd.read_csv(brca_counts_path("brca-eu_sv_counts.tsv"), sep="\t")
    cols = list(snv.columns[1:])
    X_lda = mm.format_counts_lda(snv, cols)
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

    R = args.restarts
    base = dict(restarts=R, maxiter=args.maxiter, tol=args.tol)
    arms = {}
    for mode in ("plain", "auto"):
        kw = dict(base)
        if mode == "auto":
            kw["compact_schedule"] = "auto"
        arms[f"lda_{mode}"] = (
            lambda kw=kw: fit_lda_restarts(7, 0.1, 0.1, X_lda, **kw))
        arms[f"ilda_{mode}"] = (
            lambda kw=kw: fit_ilda_restarts(7, 0.1, 0.1, feats, X_lda, **kw))
        arms[f"immctm_{mode}"] = (
            lambda kw=kw: fit_immctm_restarts(
                [7, 7], [0.1, 0.1], [feats, feats_sv], X_mm, **kw))
        arms[f"mmctm2s_{mode}"] = (
            lambda mode=mode: fit_mmctm_restarts(
                [7, 7], [0.1, 0.1], X_mm, restarts=R, maxiter=args.maxiter,
                compact_schedule="auto" if mode == "auto" else None))

    out = {"platform": jax.devices()[0].platform, "restarts": R,
           "reps": args.reps, "tol": args.tol}
    for name, fn in arms.items():
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            model = fn()
            walls.append(round(time.perf_counter() - t0, 3))
        info = getattr(model, "compact_info", None)
        out[name] = {"walls_s": walls, "min_s": min(walls)}
        if info:
            out[name]["schedule"] = [int(s) for s in info["schedule"]]
            out[name]["pilot_warm_s"] = round(info["pilot_warm_s"], 3)
        print(name, json.dumps(out[name]), flush=True)

    # --- phase breakdown of the production LDA runner (module-level jit,
    # X as an argument): trace+lower, compile (persistent-cache hit or
    # miss), execute — isolates host overhead from device work ----------
    from multimodalmusig_tpu.models.lda import LDA
    from multimodalmusig_tpu.parallel.restarts import _lda_restarts_from_keys

    model = LDA(7, 0.1, 0.1, X_lda)
    cfg, Xd = model.config, model.Xdense
    keys = jax.random.split(jax.random.key(147959412), R)

    t0 = time.perf_counter()
    lowered = _lda_restarts_from_keys.lower(
        keys, Xd, config=cfg, maxiter=args.maxiter, tol=args.tol
    )
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(compiled(keys, Xd))
    t_exec1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(compiled(keys, Xd))
    t_exec2 = time.perf_counter() - t0
    out["lda_phase_breakdown"] = {
        "trace_lower_s": round(t_lower, 3),
        "compile_s": round(t_compile, 3),
        "exec1_s": round(t_exec1, 3),
        "exec2_s": round(t_exec2, 3),
    }
    print("lda_phase_breakdown", json.dumps(out["lda_phase_breakdown"]))
    print(json.dumps(out))

    if not args.no_record:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_LOCAL.json")
        with open(path) as f:
            data = json.load(f)
        data["family_auto_ab_r5"] = out
        with open(path, "w") as f:
            json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
