"""Roofline position of one CAVI iteration on the TPU chip.

Answers VERDICT r2 weak #4: what bounds the ~3 ms benchmark iteration —
VPU FLOPs, HBM bandwidth, or dispatch overhead? Method:

  * device time: N full CAVI iterations (R vmapped restarts) inside ONE
    fori_loop executable, differenced between two N (tools/iter_time.py
    pattern — the tunnel adds ~28 ms per dispatch, so single-op timings
    are meaningless);
  * work: XLA's own cost model for that executable
    (compiled.cost_analysis(): flops + bytes accessed), divided by N;
  * peaks (TPU v5e / v5 lite, public figures): 197 TFLOP/s bf16 MXU,
    ~3.9 TFLOP/s f32 VPU (8x128 lanes x 4 ALUs x ~0.94 GHz), 819 GB/s HBM;
  * dispatch floor: wall-clock of an empty-ish executable through the
    tunnel, i.e. the per-dispatch cost a fit pays once, not per iteration.

The model is VPU-bound by design: MK=14 contractions would use ~1% of the
MXU's 128x128 tiles (ops/solvers.py _mv), so all Σ⁻¹ algebra runs as VPU
broadcast-reduce, and the θ-path is exp/softmax/einsum elementwise work.
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

V5E_VPU_F32 = 3.9e12   # FLOP/s (8x128 lanes x 4 ALUs x 0.94 GHz)
V5E_MXU_BF16 = 197e12  # FLOP/s
V5E_HBM = 819e9        # B/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import load_counts_np
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import counts_per_doc
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha

    R = args.restarts
    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    keys = jax.random.split(jax.random.key(0), R)
    states = jax.vmap(lambda k: init_with_alpha(k, config, X, alpha))(keys)
    N = counts_per_doc(X)
    step = mmod.fit_step_fn(X, N, config)

    def run_iters(states, n_iters):
        def body(_, carry):
            s, _ = carry
            return step(s)

        return jax.lax.fori_loop(
            0, n_iters, body, (states, jnp.zeros((config.M,), jnp.float32))
        )

    def build(n):
        return jax.jit(jax.vmap(lambda s: run_iters(s, n))).lower(states).compile()

    def timed(compiled):
        out = compiled(states)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(compiled(states))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = args.iters, 2 * args.iters
    c1, c2 = build(n1), build(n2)
    t1, t2 = timed(c1), timed(c2)
    per_iter = (t2 - t1) / (n2 - n1)

    # dispatch floor: a near-empty executable, round-tripped
    tiny = jax.jit(lambda x: x + 1.0).lower(jnp.zeros((8,), jnp.float32)).compile()
    jax.block_until_ready(tiny(jnp.zeros((8,), jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(tiny(jnp.zeros((8,), jnp.float32)))
    dispatch = (time.perf_counter() - t0) / 5

    # XLA's cost model for the whole N-iteration program
    def costs(compiled, n):
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return flops / n, byts / n

    f1, b1 = costs(c1, n1)
    f2, b2 = costs(c2, n2)
    # difference out loop-invariant setup the same way as the timing
    flops_it = (f2 * n2 - f1 * n1) / (n2 - n1)
    bytes_it = (b2 * n2 - b1 * n1) / (n2 - n1)
    cost_source = "xla_cost_analysis"

    if not (flops_it > 0):
        # The axon backend's cost_analysis returns zeros; count by hand from
        # the op structure (elementwise ops and transcendentals counted as
        # one FLOP each — a LOWER bound, since exp costs multiple VPU cycles).
        cost_source = "analytic_lower_bound"
        D, MK, M = config.D, config.MK, config.M
        V_total = sum(config.V)
        VK = sum(config.V[m] * config.K[m] for m in range(M))
        from multimodalmusig_tpu.ops import flags as _flags

        if _flags.THETA_FACTORIZED:
            # exp-factorized θ moments (ctm_base.theta_moments): 3 matmuls
            # over (D, V_m) x K_m (Z, sumθ, scatter — 2 FLOP/cell each) +
            # D·MK + VK exps + the X/Z divide, plus the ll mixture
            # P = props·ϕ (2·D·VK) and X·log P (~3·D·V)
            f_theta = (
                6.0 * D * VK              # the three moment matmuls
                + (D * MK + VK)           # exps (A and B tables)
                + D * V_total             # X / Z
                + 2.0 * D * VK            # ll mixture matmul
                + 3.0 * D * V_total       # safe_xlogy + reduce
            )
        else:
            # materialized softmax path: logits add + exp + normalize (2) +
            # sumθ einsum (2) + γ-scatter einsum (2) + ll mixture (2)
            # + log/weight (1) ≈ 10 ops per (D, V_m, K_m) cell
            f_theta = 10.0 * D * VK
        # ζ: exp + block sums
        f_zeta = 3.0 * D * MK
        # budgets: the f32 fit-path warm-start caps (ctm_base.solve_eta)
        from multimodalmusig_tpu.ops.solvers import (
            CG_F32_CAVI,
            LAMBDA_NITER_F32_CAVI,
            LAMBDA_POLISH_F32_CAVI,
            NU_FP_F32_CAVI,
            _N_BACKTRACK,
        )

        # ν: fixed-point sweeps + 4 Newton polish, ~6 ops each
        f_nu = (NU_FP_F32_CAVI + 4) * 6.0 * D * MK
        # λ: (LAMBDA_NITER_F32_CAVI Newton + polish) rounds — the f32 fit
        # path's warm-start budget (ctm_base.solve_eta); each = gradient
        # matvec (2·MK²·D)
        #  + cg_iter CG iterations × (matvec 2·MK²·D + ~8·MK·D vector work)
        #    (cg_iter = the f32 fit-loop cap, min(MK, CG_F32_CAVI))
        #  + line search: 2 exps + (3 over + _N_BACKTRACK) candidates
        #    × ~3·MK·D + sqrt chain
        n_newton = LAMBDA_NITER_F32_CAVI + LAMBDA_POLISH_F32_CAVI
        cg_iter = min(MK, CG_F32_CAVI)
        f_round = (
            2.0 * MK * MK * D
            + cg_iter * (2.0 * MK * MK * D + 8.0 * MK * D)
            + (3 + _N_BACKTRACK + 2) * 3.0 * MK * D
        )
        f_lambda = n_newton * f_round
        flops_it = R * (f_theta + f_zeta + f_nu + f_lambda)
        # HBM floor: the carry state (λ, ν read+write; ζ, γ, sumθ, ll) —
        # intra-iteration intermediates fuse into VMEM. Lower bound.
        state_bytes = 4.0 * R * (
            2 * 2 * D * MK          # λ, ν read+write
            + 2 * D * M             # ζ
            + 2 * VK                # γ/Elnϕ
            + D * MK                # sumθ
        )
        bytes_it = state_bytes

    achieved_flops = flops_it / per_iter
    achieved_bw = bytes_it / per_iter
    t_vpu = flops_it / V5E_VPU_F32
    t_hbm = bytes_it / V5E_HBM

    out = {
        "platform": jax.devices()[0].platform,
        "R": R,
        "per_iteration_device_s": round(per_iter, 6),
        "dispatch_floor_s": round(dispatch, 4),
        "cost_source": cost_source,
        "flops_per_iteration": flops_it,
        "bytes_per_iteration": bytes_it,
        "achieved_tflops": round(achieved_flops / 1e12, 3),
        "achieved_gbps": round(achieved_bw / 1e9, 1),
        "vpu_bound_time_s": round(t_vpu, 6),
        "hbm_bound_time_s": round(t_hbm, 6),
        "vpu_utilization_pct": round(100 * achieved_flops / V5E_VPU_F32, 1),
        "hbm_utilization_pct": round(100 * achieved_bw / V5E_HBM, 1),
    }
    print(json.dumps(out, indent=1))
    bound = "VPU FLOPs" if t_vpu >= t_hbm else "HBM bandwidth"
    other = min(t_vpu, t_hbm)
    print(
        f"\nbinding constraint by {cost_source}: {bound} "
        f"(ideal {max(t_vpu, t_hbm)*1e3:.3f} ms vs measured {per_iter*1e3:.3f} ms; "
        f"the other roof would allow {other*1e3:.3f} ms)."
    )
    print(
        f"dispatch floor is {dispatch*1e3:.1f} ms per device call (paid once "
        f"per fit, not per iteration — the fit is one while_loop dispatch)."
    )


if __name__ == "__main__":
    main()
