"""End-to-end wall of the zero-config auto-compact fit vs the pinned
schedule (round-4 verdict #4 done-criterion: auto R=1000 within ~10% of the
pinned headline, measured INCLUDING schedule derivation).

Arms (warm: each runs twice, the second is timed, so compiles are excluded
from both equally — the folded pilot reuses fit_restarts_from_keys'
executable for its P-lane shape after the first run):

  pinned — fit_restarts(compact_schedule=bench.R1000_SCHEDULE)
  auto   — fit_restarts_auto (folded pilot: first P lanes unchunked +
           timed, boundary calibration, DP, remaining lanes scheduled)

Appends auto_e2e_r5 to BENCH_LOCAL.json with --record.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=1000)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import R1000_SCHEDULE, load_counts_np
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig
    from multimodalmusig_tpu.parallel.restarts import (
        fit_restarts,
        fit_restarts_auto,
    )

    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    key = jax.random.key(147959412)
    R = args.restarts

    def pinned():
        r = fit_restarts(key, X, config, alpha, restarts=R, maxiter=1000,
                         tol=1e-5, compact_schedule=R1000_SCHEDULE)
        np.asarray(r.ll)
        return r, None

    def auto():
        r, info = fit_restarts_auto(key, X, config, alpha, restarts=R,
                                    maxiter=1000, tol=1e-5)
        np.asarray(r.ll)
        return r, info

    out = {"platform": jax.devices()[0].platform, "restarts": R,
           "pinned_schedule": list(R1000_SCHEDULE)}
    for name, fn in (("pinned", pinned), ("auto", auto)):
        fn()  # warm
        t0 = time.perf_counter()
        r, info = fn()
        t = time.perf_counter() - t0
        ll = np.asarray(r.ll)
        out[name] = {
            "wall_s": round(t, 3),
            "restarts_per_sec": round(R / t, 1),
            "finite": int(np.isfinite(ll).all(axis=1).sum()),
        }
        if info is not None:
            out[name]["derived_schedule"] = list(info["schedule"])
            out[name]["pilot_restarts"] = info["pilot_restarts"]
            out[name]["boundary_s"] = round(info["boundary_s"], 4)
        print(name, json.dumps(out[name]))
    out["auto_over_pinned"] = round(
        out["auto"]["wall_s"] / out["pinned"]["wall_s"], 3)
    print(json.dumps(out))

    if args.record:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_LOCAL.json")
        with open(path) as f:
            data = json.load(f)
        data["auto_e2e_r5"] = out
        with open(path, "w") as f:
            json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
