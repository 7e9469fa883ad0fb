"""DEMOTED EXPERIMENT — fully fused E-step η update (ζ → N/ζ → ν → λ in one
VMEM-resident Pallas kernel). See tools/pallas_experiments/__init__.py for
the measurement history; at the round-5 cg=4 operating point this kernel
LOSES to both pure XLA (0.92x) and the λ-only kernel (0.75x) on the
100-restart BRCA fit, so the package's solve_eta no longer gates on it.
Correctness is still pinned by interpret-mode parity tests
(tests/test_pallas_kernels.py), which import this module from here.

Mirrors ops.solvers.maximize_nu / maximize_lambda op-for-op via the shared
pieces imported from the package's lambda_kernel (the winning λ kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalmusig_tpu.ops.pallas.lambda_kernel import (
    PALLAS_MAX_MK,
    _lambda_solve,
    _N_POLISH,
    _pad_transposed,
    _shared_blocks,
)
from multimodalmusig_tpu.ops.solvers import (
    CG_ITER_F32_CAP,
    NU_FP_ITERS as _NU_FP_ITERS,
    NU_LOWER_BOUND as _NU_LB,
)
from multimodalmusig_tpu.ops.solvers import _N_POLISH as _NU_POLISH

__all__ = ["estep_eta_fused"]


def _estep_solve(lam, nu_in, Np, st, mu_col, invS, *, offsets, K, M,
                 n_iter: int, cg_iter: int,
                 nu_n_iter: int = _NU_FP_ITERS, n_polish: int = _N_POLISH):
    """ζ (src/MMCTM.jl:172-181), Ndivζ (:119-125), the ν solve (:156-170)
    and the λ solve (:127-143) on one (MKP, TB) block. Mirrors
    ops.solvers.maximize_nu / maximize_lambda op-for-op so the fused and XLA
    paths agree to f32 rounding."""
    MKP, TB = lam.shape

    e = jnp.exp(lam + 0.5 * nu_in)
    zeta_rows = [
        jnp.sum(e[o : o + k, :], axis=0, keepdims=True)  # (1, TB)
        for o, k in zip(offsets, K)
    ]
    # ζ output block: real modalities then inert 1.0 pad rows
    MP = Np.shape[0]
    zeta = jnp.concatenate(
        zeta_rows + [jnp.ones((MP - M, TB), lam.dtype)], axis=0
    )
    ndz = jnp.concatenate(
        [
            jnp.broadcast_to(Np[m : m + 1, :] / zeta_rows[m], (K[m], TB))
            for m in range(M)
        ]
        + [jnp.zeros((MKP - sum(K), TB), lam.dtype)],
        axis=0,
    )

    # ν solve (ops.solvers.maximize_nu: contractive fixed point + Newton
    # polish; padded rows have b = 0, a = 0.5 ⇒ stay at 1).
    a = 0.5 * jnp.diagonal(invS)[:, None]
    b = ndz * jnp.exp(lam)

    def wexp(nu):
        return jnp.where(b > 0, b * jnp.exp(jnp.minimum(0.5 * nu, 60.0)), 0.0)

    def fp(_, nu):
        return jnp.clip(1.0 / (2.0 * a + wexp(nu)), _NU_LB)

    def nu_polish(_, nu):
        w = wexp(nu)
        g = -a - 0.5 * w + 0.5 / nu
        hess = -0.25 * w - 0.5 / (nu * nu)
        step = jnp.clip(nu - g / hess, _NU_LB)
        return jnp.where(jnp.isfinite(step), step, nu)

    nu = jax.lax.fori_loop(0, nu_n_iter, fp, nu_in)
    nu = jax.lax.fori_loop(0, _NU_POLISH, nu_polish, nu)

    lam_out = _lambda_solve(
        lam, nu, ndz, st, mu_col, invS, n_iter=n_iter, cg_iter=cg_iter,
        n_polish=n_polish,
    )
    return zeta, nu, lam_out


def _estep_kernel(lam_ref, nu_ref, N_ref, st_ref, mu_ref, invS_ref,
                  zeta_ref, nu_out_ref, lam_out_ref,
                  *, offsets, K, M, n_iter: int, cg_iter: int,
                  nu_n_iter: int, n_polish: int):
    zeta, nu, lam = _estep_solve(
        lam_ref[:], nu_ref[:], N_ref[:], st_ref[:],
        mu_ref[:][:, 0:1], invS_ref[:],
        offsets=offsets, K=K, M=M, n_iter=n_iter, cg_iter=cg_iter,
        nu_n_iter=nu_n_iter, n_polish=n_polish,
    )
    zeta_ref[:] = zeta
    nu_out_ref[:] = nu
    lam_out_ref[:] = lam


@functools.partial(
    jax.jit,
    static_argnames=(
        "K", "n_iter", "cg_iter", "polish_iter", "nu_n_iter", "tile_b",
        "interpret",
    ),
)
def estep_eta_fused(
    lam0, nu, N, sumtheta, mu, invSigma, K,
    n_iter: int = 7, cg_iter: int = None, polish_iter: int = None,
    nu_n_iter: int = None, tile_b: int = 2048,
    interpret: bool = False,
):
    """Fused E-step η update: (ζ, ν', λ') from one kernel launch.

    lam0/nu/sumtheta: (B, MK); N: (B, M) per-doc per-modality counts;
    mu: (MK,); invSigma: (MK, MK); K: static per-modality topic counts
    (sum(K) == MK). Returns (zeta (B, M), nu' (B, MK), lam' (B, MK)).

    Equivalent to update_zeta → calculate_Ndivzeta → maximize_nu →
    maximize_lambda (models/ctm_base.py solve_eta XLA path) with all
    intermediates VMEM-resident.
    """
    B, MK = lam0.shape
    K = tuple(int(k) for k in K)
    M = len(K)
    if sum(K) != MK:
        raise ValueError(f"sum(K)={sum(K)} != MK={MK}")
    if MK > PALLAS_MAX_MK:
        raise ValueError(f"MK={MK} exceeds the fused kernel's lane budget {PALLAS_MAX_MK}")
    if cg_iter is None:
        cg_iter = min(MK, CG_ITER_F32_CAP)  # f32 kernel: see solvers.maximize_lambda
    if polish_iter is None:
        polish_iter = _N_POLISH
    if nu_n_iter is None:
        nu_n_iter = _NU_FP_ITERS
    dt = jnp.float32
    MKP = max(8, ((MK + 7) // 8) * 8)
    MP = max(8, ((M + 7) // 8) * 8)
    tile_b = min(tile_b, ((B + 127) // 128) * 128)
    Bp = ((B + tile_b - 1) // tile_b) * tile_b
    offsets = []
    acc = 0
    for k in K:
        offsets.append(acc)
        acc += k
    offsets = tuple(offsets)

    lam_p = _pad_transposed(lam0, MKP, Bp)
    nu_p = _pad_transposed(nu, MKP, Bp, fill=1.0)
    N_p = _pad_transposed(N, MP, Bp)
    st_p = _pad_transposed(sumtheta, MKP, Bp)
    mu_p, invS_p = _shared_blocks(mu, invSigma, MK, MKP)

    grid = (Bp // tile_b,)
    tile = lambda w: pl.BlockSpec((w, tile_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    zeta, nu_out, lam_out = pl.pallas_call(
        functools.partial(
            _estep_kernel, offsets=offsets, K=K, M=M,
            n_iter=n_iter, cg_iter=cg_iter,
            nu_n_iter=nu_n_iter, n_polish=polish_iter,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((MP, Bp), dt),
            jax.ShapeDtypeStruct((MKP, Bp), dt),
            jax.ShapeDtypeStruct((MKP, Bp), dt),
        ),
        grid=grid,
        in_specs=[
            tile(MKP), tile(MKP), tile(MP), tile(MKP),
            pl.BlockSpec((MKP, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((MKP, MKP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(tile(MP), tile(MKP), tile(MKP)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * MKP * MKP * (n_iter + polish_iter) * (cg_iter + 3),
            bytes_accessed=8 * Bp * MKP * 4,
            transcendentals=3 * Bp * MKP * (n_iter + polish_iter + nu_n_iter),
        ),
        interpret=interpret,
    )(lam_p, nu_p, N_p, st_p, mu_p, invS_p)
    return (
        zeta[:M, :B].T.astype(lam0.dtype),
        nu_out[:MK, :B].T.astype(lam0.dtype),
        lam_out[:MK, :B].T.astype(lam0.dtype),
    )
