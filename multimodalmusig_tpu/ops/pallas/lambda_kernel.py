"""Pallas TPU kernel: the entire batched λ Newton solve fused in VMEM.

The λ maximization (replacing NLopt LD_MMA, src/MMCTM.jl:127-143) is the hot
op of MMCTM fitting: ~25 damped-Newton iterations per document per CAVI
iteration, each built from ~100 small elementwise/matmul ops on (B, MK)
tensors. As an XLA op graph every one of those ops round-trips HBM; fused in
a Pallas kernel the whole solve runs out of VMEM — per document tile, the
inputs are read from HBM exactly once and the result written once.

Layout: MK (= total topics, ~14 for the flagship) is padded to the 128-lane
TPU tile; padded lanes are constructed to be exact no-ops (identity rows in
Σ⁻¹, zero Ndivζ/sumθ, ν=1, λ=μ=0 ⇒ zero gradient, zero Newton step). The
per-document axis tiles across the grid. Matvecs with the shared Σ⁻¹ hit the
MXU as (TILE_B, 128) @ (128, 128) matmuls; everything else is VPU.

The math is identical to ops.solvers.maximize_lambda (fixed-count damped
Newton with candidate line search + CG inner solves); equality is enforced
by tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["maximize_lambda_fused", "PALLAS_LANE"]

PALLAS_LANE = 128  # TPU lane width; MK is padded to this

# Keep in sync with ops.solvers._step_scales / _N_POLISH
_OVER_STEPS = (8.0, 4.0, 2.0)
_N_BACKTRACK = 13
_N_POLISH = 4


def _scales() -> tuple:
    # Python floats (weakly typed) so x64 mode can't promote the f32 carry
    return tuple(_OVER_STEPS) + tuple(float(2.0**-i) for i in range(_N_BACKTRACK)) + (0.0,)


def _lambda_kernel(scales_ref, lam_ref, nu_ref, ndz_ref, st_ref, mu_ref,
                   invS_ref, out_ref, *, n_iter: int, cg_iter: int):
    lam = lam_ref[:]          # (TB, 128)
    nu = nu_ref[:]
    ndz = ndz_ref[:]
    st = st_ref[:]
    mu = mu_ref[:]            # (1, 128)
    invS = invS_ref[:]        # (128, 128)
    n_scales = scales_ref.shape[1]

    def matS(v):
        return jnp.dot(v, invS, preferred_element_type=jnp.float32)

    def objective(l):
        diff = l - mu
        quad = -0.5 * jnp.sum(diff * matS(diff), axis=-1, keepdims=True)
        Eeta = jnp.exp(l + 0.5 * nu)
        return quad + jnp.sum(l * st - ndz * Eeta, axis=-1, keepdims=True)

    def grad_and_w(l):
        w = ndz * jnp.exp(l + 0.5 * nu)
        g = -matS(l - mu) + st - w
        return g, w

    def cg(w, g):
        # (Σ⁻¹ + diag(w)) δ = g by CG; matvec = MXU matmul + elementwise
        x = jnp.zeros_like(g)
        r = g
        p = r
        rs = jnp.sum(r * r, axis=-1, keepdims=True)

        def body(_, carry):
            x, r, p, rs = carry
            Ap = matS(p) + w * p
            alpha = rs / (jnp.sum(p * Ap, axis=-1, keepdims=True) + 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.sum(r * r, axis=-1, keepdims=True)
            beta = rs_new / (rs + 1e-30)
            p = r + beta * p
            return x, r, p, rs_new

        x, *_ = jax.lax.fori_loop(0, cg_iter, body, (x, r, p, rs))
        return x

    def newton(_, lam):
        g, w = grad_and_w(lam)
        delta = cg(w, g)

        # candidate line search as a bounded loop (an unrolled version blew
        # up Mosaic compile time); scale 0 / the current point is the fallback
        def ls_body(s_idx, carry):
            best_f, best_lam = carry
            c = lam + scales_ref[0, s_idx] * delta
            f = objective(c)
            ok = jnp.isfinite(f) & (f > best_f)
            return jnp.where(ok, f, best_f), jnp.where(ok, c, best_lam)

        _, best_lam = jax.lax.fori_loop(
            0, n_scales, ls_body, (objective(lam), lam)
        )
        return best_lam

    def polish(_, lam):
        g, w = grad_and_w(lam)
        step = lam + cg(w, g)
        ok = jnp.all(jnp.isfinite(step), axis=-1, keepdims=True)
        return jnp.where(ok, step, lam)

    lam = jax.lax.fori_loop(0, n_iter, newton, lam)
    lam = jax.lax.fori_loop(0, _N_POLISH, polish, lam)
    out_ref[:] = lam


@functools.partial(
    jax.jit, static_argnames=("n_iter", "cg_iter", "tile_b", "interpret")
)
def maximize_lambda_fused(
    lam0, nu, Ndivzeta, sumtheta, mu, invSigma,
    n_iter: int = 20, cg_iter: int = None, tile_b: int = 1024,
    interpret: bool = False,
):
    """Drop-in fused equivalent of ops.solvers.maximize_lambda.

    lam0/nu/Ndivzeta/sumtheta: (B, MK); mu: (MK,); invSigma: (MK, MK).
    Requires MK <= 128 (pads to the TPU lane width).
    """
    B, MK = lam0.shape
    if MK > PALLAS_LANE:
        raise ValueError(f"MK={MK} exceeds the fused kernel's lane budget {PALLAS_LANE}")
    if cg_iter is None:
        cg_iter = MK
    dt = jnp.float32
    P = PALLAS_LANE

    # pad documents to a tile multiple and MK to the lane width;
    # padded lanes are exact no-ops (see module docstring)
    Bp = ((B + tile_b - 1) // tile_b) * tile_b

    def pad_bm(x, fill=0.0):
        return jnp.pad(
            x.astype(dt), ((0, Bp - B), (0, P - MK)), constant_values=fill
        )

    lam_p = pad_bm(lam0)
    nu_p = jnp.pad(nu.astype(dt), ((0, Bp - B), (0, P - MK)), constant_values=1.0)
    ndz_p = pad_bm(Ndivzeta)
    st_p = pad_bm(sumtheta)
    mu_p = jnp.pad(mu.astype(dt), (0, P - MK)).reshape(1, P)
    eye_pad = jnp.eye(P, dtype=dt).at[:MK, :MK].set(0.0)
    invS_p = jnp.zeros((P, P), dt).at[:MK, :MK].set(invSigma.astype(dt)) + eye_pad

    scales_arr = jnp.asarray(_scales()[:-1], dt).reshape(1, -1)

    grid = (Bp // tile_b,)
    out = pl.pallas_call(
        functools.partial(_lambda_kernel, n_iter=n_iter, cg_iter=cg_iter),
        out_shape=jax.ShapeDtypeStruct((Bp, P), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, scales_arr.shape[1]), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * P * P * (n_iter + _N_POLISH) * (cg_iter + 2),
            bytes_accessed=5 * Bp * P * 4,
            transcendentals=Bp * P * (n_iter * (len(_scales()) + 1) + _N_POLISH),
        ),
        interpret=interpret,
    )(scales_arr, lam_p, nu_p, ndz_p, st_p, mu_p, invS_p)
    return out[:B, :MK].astype(lam0.dtype)
