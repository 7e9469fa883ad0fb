"""Selection stability under TPU compaction (round-3 verdict weak #3).

Compacted phases are separate executables whose f32 rounding differs from
the single-dispatch fit; hundreds of CAVI iterations amplify that to ~1e-3
on a few lanes' final ll. This tool measures whether that drift can FLIP the
restart selection: it runs schedule vs no-schedule at the same seed and
compares (a) the per-modality stage-1 winners (pick_optimal_modality_restarts
— what gets grafted into stage 2, run_mmctm.jl:86-97) and (b) the dense-rank
pick (pick_optimal_model's criterion, run_mmctm.jl:136-147), and quantifies
the near-tie margin: the winner's ll lead over the runner-up vs the maximum
cross-run ll drift. A lead >> drift means selection is robust; a lead within
drift is a genuine near-tie where either pick is defensible.

Appends a record to BENCH_LOCAL.json with --record.
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


def compare(R, schedule, X, config, alpha, maxiter, tol):
    from multimodalmusig_tpu.parallel.restarts import (
        fit_restarts,
        pick_optimal_modality_restarts,
        pick_optimal_restart,
    )

    key = jax.random.key(147959412)
    lls = {}
    for label, sched in (("unchunked", None), ("schedule", schedule)):
        t0 = time.perf_counter()
        result = fit_restarts(
            key, X, config, alpha, restarts=R, maxiter=maxiter, tol=tol,
            compact_schedule=sched,
        )
        ll = np.asarray(jax.device_get(result.ll), np.float64)
        lls[label] = ll
        print(f"R={R} {label}: {time.perf_counter() - t0:.2f}s "
              f"finite={np.isfinite(ll).all(axis=1).sum()}/{R}")

    a, b = lls["unchunked"], lls["schedule"]
    finite = np.isfinite(a).all(axis=1) & np.isfinite(b).all(axis=1)
    drift = float(np.max(np.abs(a[finite] - b[finite]))) if finite.any() else float("nan")

    win_a = np.asarray(pick_optimal_modality_restarts(jnp.asarray(a)))
    win_b = np.asarray(pick_optimal_modality_restarts(jnp.asarray(b)))
    pick_a = int(pick_optimal_restart(jnp.asarray(a)))
    pick_b = int(pick_optimal_restart(jnp.asarray(b)))

    # near-tie margin: winner's lead over the runner-up, per modality
    margins = []
    for m in range(a.shape[1]):
        col = np.where(np.isfinite(a[:, m]), a[:, m], -np.inf)
        top2 = np.sort(col)[-2:]
        margins.append(float(top2[1] - top2[0]))

    rec = {
        "R": R,
        "schedule": list(schedule),
        "stage1_winners_agree": bool((win_a == win_b).all()),
        "winners_unchunked": win_a.tolist(),
        "winners_schedule": win_b.tolist(),
        "dense_rank_pick_agrees": pick_a == pick_b,
        "pick_unchunked": pick_a,
        "pick_schedule": pick_b,
        "max_crossrun_ll_drift": drift,
        "winner_margins": margins,
        "margin_over_drift": [m / drift if drift > 0 else float("inf") for m in margins],
    }
    print(json.dumps(rec, indent=2))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true", help="append to BENCH_LOCAL.json")
    ap.add_argument("--skip-r1000", action="store_true")
    args = ap.parse_args()

    from bench import R100_SCHEDULE, R1000_SCHEDULE, load_counts_np
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig

    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)

    recs = {"platform": jax.devices()[0].platform}
    recs["r100"] = compare(100, R100_SCHEDULE, X, config, alpha, 1000, 1e-5)
    if not args.skip_r1000:
        recs["r1000"] = compare(1000, R1000_SCHEDULE, X, config, alpha, 1000, 1e-5)

    if args.record:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "BENCH_LOCAL.json")
        with open(path) as f:
            data = json.load(f)
        data["selection_stability_r4"] = recs
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"recorded selection_stability_r4 -> {path}")


if __name__ == "__main__":
    main()
