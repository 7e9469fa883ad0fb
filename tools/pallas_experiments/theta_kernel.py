"""Pallas TPU kernel: θ moments (sumθ + γ scatter) without materializing θ.

The responsibilities θ[d,v,k] = softmax_k(λ_block[d,k] + logw[v,k]) form the
largest tensor of an MMCTM iteration — (D, V_m, K_m) per modality, per
restart lane (src/MMCTM.jl:183-198). The fit loop only ever consumes two
contractions of it (src/MMCTM.jl:110-117, 224-242):

    sumθ[d, k] = Σ_v X[d, v] · θ[d, v, k]      (the λ objective's linear term)
    γc[k, v]   = Σ_d X[d, v] · θ[d, v, k]      (the topic-word scatter)

so this kernel computes both in one VMEM-resident pass per document tile —
θ itself never touches HBM. Measured: the θ path (softmax + both einsums +
ll) was ~half the CAVI iteration at benchmark shapes before fusion
(tools/theta_share.py).

Layout: documents ride the 8-deep sublane axis in (TILE_D, 128) blocks with
the vocab on lanes (V ≤ 128 — true for all mutation-signature vocabularies:
96 SNV / 48 SV / 24 indel); topics unroll as a static Python loop. The γ
output block ignores the document-tile grid index, so Mosaic keeps it
resident and the kernel accumulates across tiles (zeroed at tile 0).

Padding is inert by construction: padded docs have X = 0 rows (contribute 0
to both outputs), padded vocab lanes have X = 0, and padded topic rows are
never touched (static K loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["theta_moments_fused", "THETA_MAX_V"]

THETA_MAX_V = 128  # one lane tile; all reference vocabularies fit


def _theta_kernel(lam_ref, x_ref, lw_ref, st_ref, ct_ref, *, K: int):
    i = pl.program_id(0)
    lam = lam_ref[:]   # (TD, 128): λ_block in the first K lanes
    X = x_ref[:]       # (TD, 128): counts in the first V lanes, 0 elsewhere
    lw = lw_ref[:]     # (KP, 128): row k = logw[:, k]

    logits = [lam[:, k : k + 1] + lw[k : k + 1, :] for k in range(K)]
    m = logits[0]
    for k in range(1, K):
        m = jnp.maximum(m, logits[k])
    es = [jnp.exp(l - m) for l in logits]
    denom = es[0]
    for k in range(1, K):
        denom = denom + es[k]
    inv = 1.0 / denom

    TD = lam.shape[0]
    st_cols = []
    ct_rows = []
    for k in range(K):
        w = X * (es[k] * inv)  # X·θ_k, (TD, 128)
        st_cols.append(jnp.sum(w, axis=1, keepdims=True))  # Σ_v → (TD, 1)
        ct_rows.append(jnp.sum(w, axis=0, keepdims=True))  # Σ_d → (1, 128)

    st_ref[:] = jnp.concatenate(
        st_cols + [jnp.zeros((TD, 128 - K), lam.dtype)], axis=1
    )
    KP = ct_ref.shape[0]
    ct = jnp.concatenate(
        ct_rows + [jnp.zeros((KP - K, 128), lam.dtype)], axis=0
    )

    @pl.when(i == 0)
    def _():
        ct_ref[:] = ct

    @pl.when(i > 0)
    def _():
        ct_ref[:] = ct_ref[:] + ct


@functools.partial(jax.jit, static_argnames=("tile_d", "interpret"))
def theta_moments_fused(lam_block, logw, X, tile_d: int = 512, interpret: bool = False):
    """One modality's θ moments: (sumθ (D, K), γ contribution (K, V)).

    lam_block: (D, K) λ sliced to the modality's topic block; logw: (V, K)
    log topic-word weights (E[ln ϕ] smoothed, ln ϕ unsmoothed); X: (D, V)
    dense counts. Requires V ≤ 128 and K ≤ 128.
    """
    D, K = lam_block.shape
    V = X.shape[1]
    if V > THETA_MAX_V:
        raise ValueError(f"V={V} exceeds the θ kernel's single-lane-tile budget {THETA_MAX_V}")
    if K > 128:
        raise ValueError(f"K={K} exceeds 128")
    dt = jnp.float32
    KP = max(8, ((K + 7) // 8) * 8)
    tile_d = min(tile_d, ((D + 7) // 8) * 8)
    Dp = ((D + tile_d - 1) // tile_d) * tile_d

    lam_p = jnp.pad(lam_block.astype(dt), ((0, Dp - D), (0, 128 - K)))
    X_p = jnp.pad(X.astype(dt), ((0, Dp - D), (0, 128 - V)))
    lw_p = jnp.pad(logw.astype(dt).T, ((0, KP - K), (0, 128 - V)))

    grid = (Dp // tile_d,)
    st, ct = pl.pallas_call(
        functools.partial(_theta_kernel, K=K),
        out_shape=(
            jax.ShapeDtypeStruct((Dp, 128), dt),
            jax.ShapeDtypeStruct((KP, 128), dt),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_d, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_d, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_d, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * Dp * 128 * K,
            bytes_accessed=3 * Dp * 128 * 4,
            transcendentals=Dp * 128 * K,
        ),
        interpret=interpret,
    )(lam_p, X_p, lw_p)
    return (
        st[:D, :K].astype(lam_block.dtype),
        ct[:K, :V].astype(lam_block.dtype),
    )
