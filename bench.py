"""Benchmark: the BASELINE.md north-star workload.

Fits R=100 vmapped MMCTM([7,7], α=0.1) restarts on the bundled BRCA-EU
SNV+SV cohort (560 samples; the reference README's flagship workload,
README.md:20-42) to tol=1e-5 on the default accelerator.

Baseline = ONE restart of the reference's architecture: the reference is
single-threaded Julia with per-document NLopt solves (src/MMCTM.jl:457-494)
and publishes no numbers (BASELINE.md), and Julia is not in this image — so
the baseline is measured live from `tools/reference_proxy_bench.py`'s
faithful stand-in (per-document ragged θ updates + bound-constrained scipy
maximizations, the role NLopt LD_MMA plays at src/MMCTM.jl:127-170):
seconds/CAVI-iteration × the median iteration count our converged restarts
actually needed at tol=1e-5. Same math, same machine, same convergence
criterion.

Prints ONE JSON line:
  {"metric": "mmctm_restarts_per_sec_brca_tol1e-5", "value": R/t_accel,
   "unit": "restarts/s", "vs_baseline": <pinned ratio>, ...}

where vs_baseline = vs_baseline_pinned = (R/t_accel) x (pinned_floor_s_per_iter
x median_iters) uses the recorded conservative proxy floor from BASELINE.json
(stable across runs; since round 3), and vs_baseline_live re-measures the proxy
on this host now (the round-1/2 definition of vs_baseline — it swings with
shared-host load). Extra r1000_* fields report the reference-CLI-default scale.

vs_baseline >= 100 means the north-star target (BASELINE.md: 100 restarts in
less wall-clock than ONE reference-architecture CPU restart) is met.

Robustness: the parent process never initializes JAX until a bounded-time
subprocess probe confirms the default backend is healthy (a wedged remote-TPU
tunnel hangs ANY backend init — see utils/hermetic.py). On probe failure the
whole benchmark reruns on CPU in a scrubbed subprocess, and any failure still
emits a diagnostic JSON line with rc=0.
"""

import json
import os
import subprocess
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

RESTARTS = 100
CPU_RESTARTS = 16  # CPU fallback keeps the metric but shrinks the fleet
TOL = 1e-5
MAXITER = 1000
PROBE_TIMEOUT = 180.0
PROXY_ITERS = 2
METRIC = "mmctm_restarts_per_sec_brca_tol1e-5"

# Compaction schedules: the MEASURED-faster of {incumbent, fresh DP
# candidate} per scale, chosen by tools/retune_schedules.py at the round-5
# operating point (warm-start solver budgets LAMBDA_NITER_F32_CAVI=3,
# LAMBDA_POLISH_F32_CAVI=1, NU_FP_F32_CAVI=4, CG_F32_CAVI=4 + the unrolled
# Σ⁻¹). Measurement, not the DP alone, picks the pin: the DP's
# linear-in-bucket cost model is accurate down to ~128 active lanes but
# has no small-bucket floor, so its deep-tail cuts can measure slower
# (its (141,46,82) candidate measured 2.64 s vs this pin's 2.37 s).
# Measured on the v5e: R=1000 (139, 57, 39) -> 2.37 s = 423 restarts/s
# (3.31 s at the round-4 cg=10 budgets, 13.6 s unchunked at round 3);
# R=100 (178,) -> 0.33 s (0.42 s unchunked). The pilot distribution, DP
# candidates, arm walls, and solver constants behind these pins are
# recorded in BASELINE.json bench_schedule_provenance;
# tests/test_bench_pins.py checks the pins against that record.
R100_SCHEDULE = (178,)
R1000 = 1000
R1000_SCHEDULE = (139, 57, 39)


def load_counts_np():
    """(D,V) float32 numpy count matrices for SNV+SV (no JAX touched)."""
    from multimodalmusig_tpu.utils.data import brca_counts_path
    from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv

    rows = []
    for fname in ("brca-eu_snv_counts.tsv", "brca-eu_sv_counts.tsv"):
        counts, _, _ = read_counts_tsv(brca_counts_path(fname))
        rows.append(counts.T)  # (D, V)
    return rows


def _pinned_proxy_floor():
    """The recorded all-time-minimum proxy s/iter (BASELINE.json
    pinned_proxy.floor_s_per_iter). Returns (floor, source): source is
    "BASELINE.json" normally, "fallback" when the file is missing/corrupt —
    surfaced in the JSON so a stale hard-coded constant is never mistaken
    for the recorded calibration."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            return float(json.load(f)["pinned_proxy"]["floor_s_per_iter"]), "BASELINE.json"
    except Exception:
        return 7.0, "fallback"


def measure_proxy_iteration_seconds(Xnp, iters=PROXY_ITERS):
    """Seconds per CAVI iteration of the reference-architecture proxy
    (tools/reference_proxy_bench.py) on this machine's CPU. NumPy/SciPy
    only — never touches JAX."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    import numpy as np
    from reference_proxy_bench import proxy_iteration

    from multimodalmusig_tpu.utils.formatting import make_count_matrix

    K = [7, 7]
    MK = sum(K)
    D = Xnp[0].shape[0]
    X = [
        [make_count_matrix(Xnp[m].T[:, d]) for d in range(D)]
        for m in range(len(Xnp))
    ]
    rng = np.random.default_rng(0)
    state = dict(
        lam=np.zeros((D, MK)),
        nu=np.ones((D, MK)),
        mu=np.zeros(MK),
        Sigma=np.eye(MK),
        invSigma=np.eye(MK),
        gamma=[
            rng.integers(1, 101, size=(K[m], Xnp[m].shape[1])).astype(float)
            for m in range(len(Xnp))
        ],
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        state = proxy_iteration(X, K, state)
    return (time.perf_counter() - t0) / iters


def run_r1000(X, config, alpha):
    """R=1000 (the reference CLI default) with DP-scheduled straggler
    compaction (R1000_SCHEDULE); returns extra JSON fields, or a note
    string on failure (never raises)."""
    import jax
    import numpy as np

    from multimodalmusig_tpu.parallel.restarts import fit_restarts

    try:
        key = jax.random.key(147959412)
        kwargs = dict(
            restarts=R1000, maxiter=MAXITER, tol=TOL,
            compact_schedule=R1000_SCHEDULE,
        )
        np.asarray(fit_restarts(key, X, config, alpha, **kwargs).ll)  # warm
        t0 = time.perf_counter()
        result = fit_restarts(key, X, config, alpha, **kwargs)
        ll = np.asarray(result.ll)
        t = time.perf_counter() - t0
        return {
            "r1000_restarts_per_sec": round(R1000 / t, 2),
            "r1000_wall_s": round(t, 3),
            "r1000_finite_lanes": int(np.isfinite(ll).all(axis=1).sum()),
        }
    except Exception as e:  # never let the extra metric kill the main one
        return {"r1000_note": f"FAILED: {type(e).__name__}: {e}"}


def run_benchmark(restarts, note=None):
    """The measurement itself. Requires a healthy default JAX backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalmusig_tpu.models.mmctm import MMCTMConfig
    from multimodalmusig_tpu.parallel.restarts import fit_restarts

    Xnp = load_counts_np()
    D = Xnp[0].shape[0]
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=D, dtype=jnp.float32
    )
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)

    # R restarts in one compiled vmap on the default device, with the
    # straggler-compaction schedule on accelerators (identical math; the
    # CPU fallback stays unchunked — its fleet is small and boundary costs
    # differ). Warm up with the *same* program (maxiter/schedule are static,
    # so a different warmup would compile different executables and the
    # timed run would pay cold-start costs).
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    key = jax.random.key(147959412)
    kwargs = dict(
        restarts=restarts, maxiter=MAXITER, tol=TOL,
        compact_schedule=R100_SCHEDULE if restarts == RESTARTS else None,
    )
    np.asarray(fit_restarts(key, X, config, alpha, **kwargs).ll)
    t0 = time.perf_counter()
    result = fit_restarts(key, X, config, alpha, **kwargs)
    ll = np.asarray(result.ll)
    t_accel = time.perf_counter() - t0
    iters = np.asarray(result.n_iters)
    finite = np.isfinite(ll).all(axis=1)
    # dead lanes terminate early (truncated n_iters) and have NaN ll — keep
    # them out of both the baseline's iteration count and the best-ll report
    median_iters = int(np.median(iters[finite])) if finite.any() else int(np.median(iters))

    # baseline: one reference-architecture restart = s/iter × iters-to-tol.
    # Two ratios (VERDICT r2 weak #2): the LIVE proxy re-measures s/iter on
    # this host now (varies 7.7-25.7 s/iter with shared-host load), while the
    # PINNED ratio uses the recorded all-time floor from BASELINE.json —
    # stable across runs and the most conservative claimable number.
    per_iter_proxy = measure_proxy_iteration_seconds(Xnp)
    t_ref_restart = per_iter_proxy * median_iters
    pinned_floor, pinned_floor_source = _pinned_proxy_floor()
    t_ref_pinned = pinned_floor * median_iters

    value = restarts / t_accel
    out = {
        "metric": METRIC,
        "value": round(value, 4),
        "unit": "restarts/s",
        "vs_baseline": round(value * t_ref_pinned, 4),
        "vs_baseline_pinned": round(value * t_ref_pinned, 4),
        "vs_baseline_live": round(value * t_ref_restart, 4),
    }
    if pinned_floor_source != "BASELINE.json":
        out["pinned_floor_source"] = pinned_floor_source
    if note:
        out["note"] = note
    if restarts == RESTARTS:  # accelerator run: also measure the R=1000 scale
        out.update(run_r1000(X, config, alpha))
    diag = (
        f"platform={jax.devices()[0].platform} restarts={restarts} "
        f"t_accel={t_accel:.2f}s iters_median={median_iters} "
        f"finite_lanes={int(finite.sum())}/{restarts} "
        f"best_ll={np.nanmax(np.where(np.isfinite(ll), ll, np.nan), axis=0)} "
        f"proxy_s_per_iter={per_iter_proxy:.2f} (pinned_floor={pinned_floor}) "
        f"t_ref_restart={t_ref_restart:.1f}s"
    )
    return out, diag


def emit(out, diag=None):
    print(json.dumps(out))
    if diag:
        print(diag, file=sys.stderr)
    sys.stdout.flush()


def cpu_fallback_subprocess(reason):
    """Re-run this script on CPU in a scrubbed env; relay its JSON line."""
    from multimodalmusig_tpu.utils.hermetic import scrubbed_env

    print(f"bench: falling back to hermetic CPU run ({reason})", file=sys.stderr)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu"],
        env=scrubbed_env(),
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    sys.stderr.write(proc.stderr)
    line = next(
        (l for l in reversed(proc.stdout.strip().splitlines()) if l.startswith("{")),
        None,
    )
    if proc.returncode == 0 and line:
        print(line)
        sys.stdout.flush()
        return 0
    emit(
        {
            "metric": METRIC,
            "value": 0.0,
            "unit": "restarts/s",
            "vs_baseline": 0.0,
            "note": f"FAILED: cpu fallback rc={proc.returncode}",
        }
    )
    return 0


def main():
    if "--cpu" in sys.argv:
        # child mode: scrubbed env, CPU pinned in-process as a second layer
        from multimodalmusig_tpu.utils.hermetic import force_cpu

        force_cpu()
        out, diag = run_benchmark(
            CPU_RESTARTS, note="cpu fallback (default accelerator unavailable)"
        )
        emit(out, diag)
        return 0

    from multimodalmusig_tpu.utils.hermetic import probe_default_backend

    platform = probe_default_backend(timeout=PROBE_TIMEOUT)
    if platform and platform != "cpu":
        try:
            out, diag = run_benchmark(RESTARTS)
            emit(out, diag)
            return 0
        except Exception:
            traceback.print_exc()
            return cpu_fallback_subprocess("accelerator run crashed")
    if platform == "cpu":
        # A healthy plain-CPU backend is not a failure mode — no accelerator
        # on this host. Run in-process; the scrubbed subprocess is only for
        # the wedged-tunnel case (probe timed out -> platform is None).
        out, diag = run_benchmark(CPU_RESTARTS, note="cpu (no accelerator)")
        emit(out, diag)
        return 0
    return cpu_fallback_subprocess(
        f"default backend probe timed out after {PROBE_TIMEOUT:.0f}s"
    )


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        emit(
            {
                "metric": METRIC,
                "value": 0.0,
                "unit": "restarts/s",
                "vs_baseline": 0.0,
                "note": "FAILED: see stderr",
            }
        )
        sys.exit(0)
