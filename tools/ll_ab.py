"""A/B candidate schedules for the per-iteration ll metric (VERDICT r4 #2).

The per-CAVI-iteration ll (modality_loglikelihoods — reference semantics
src/MMCTM.jl:384-448) is ~40% of the iteration at the round-4 operating
point: per modality one (D,K)@(K,V) MXU matmul plus a dense safe_xlogy over
(D, V_m) — R·D·ΣV_m ≈ 7.2M f32 logs+selects per iteration at R=100 on BRCA.
X's zero pattern is static per fit (~34% of SNV cells, more on SV), so logs
at X==0 cells are pure waste. Arms (all chained inside one dispatch so the
~28 ms tunnel floor divides away):

  dense_safe    — current production path (safe_xlogy over the dense P)
  dense_nosafe  — X * log(P): drops both selects (P = props@phi is strictly
                  positive whenever gamma >= alpha > 0, so log is finite and
                  X=0 cells contribute exact 0)
  sparse_gather — S = E@phi dense on the MXU; gather S at the static
                  nonzero cells (one (R, nnz) take per modality), log only
                  those, dot with the static X values; row-normalizer term
                  via D logs of rowsum(E)
Numerical note: sparse arms compute log S - log rowsum instead of
log(S/rowsum) — last-bit f32 drift only.
"""

import argparse
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
    ap.add_argument("--chain", type=int, default=50)
    args = ap.parse_args()
    R, CH = args.restarts, args.chain

    from bench import load_counts_np
    from multimodalmusig_tpu.models import mmctm as mmod
    from multimodalmusig_tpu.models.ctm_base import counts_per_doc
    from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha
    from multimodalmusig_tpu.ops.special import safe_xlogy

    Xnp = load_counts_np()
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=Xnp[0].shape[0],
        dtype=jnp.float32,
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    M = config.M
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    keys = jax.random.split(jax.random.key(0), R)
    states = jax.vmap(lambda k: init_with_alpha(k, config, X, alpha))(keys)
    N = counts_per_doc(X)

    step = mmod.fit_step_fn(X, N, config)
    warm = jax.jit(jax.vmap(lambda s: jax.lax.fori_loop(
        0, 20, lambda _, c: step(c[0]), (s, jnp.zeros((config.M,), jnp.float32))
    )[0]))
    states = warm(states)
    jax.block_until_ready(states)

    # static nonzero structure (host, once per fit)
    flat_idx, vals, sumX = [], [], []
    for m in range(M):
        fi = np.flatnonzero(Xnp[m] > 0)
        flat_idx.append(jnp.asarray(fi, jnp.int32))
        vals.append(jnp.asarray(Xnp[m].reshape(-1)[fi], jnp.float32))
        sumX.append(float(Xnp[m].sum()))
        print(f"modality {m}: nnz {fi.size}/{Xnp[m].size} "
              f"({fi.size / Xnp[m].size:.1%})")
    def dense_safe(s):
        return mmod.modality_loglikelihoods(
            X, mmod.props_from(s.lam, config), mmod.phi_point(s.gamma))

    def dense_nosafe(s):
        props = mmod.props_from(s.lam, config)
        phi = mmod.phi_point(s.gamma)
        out = []
        for m in range(M):
            P = props[m] @ phi[m]
            out.append(jnp.sum(X[m] * jnp.log(P)) / sumX[m])
        return jnp.stack(out)

    def _sparse_parts(s):
        phi = mmod.phi_point(s.gamma)
        out = []
        for m in range(M):
            lam_m = config.block(s.lam, m)
            E = jnp.exp(lam_m - jnp.max(lam_m, axis=1, keepdims=True))
            S = jnp.matmul(E, phi[m])          # (D, V) MXU
            rows = jnp.log(jnp.sum(E, axis=1)) # (D,)
            out.append((S, rows))
        return out

    def sparse_gather(s):
        parts = _sparse_parts(s)
        out = []
        for m, (S, rows) in enumerate(parts):
            g = jnp.take(S.reshape(-1), flat_idx[m])
            ll = jnp.dot(vals[m], jnp.log(g)) - jnp.dot(N[:, m], rows)
            out.append(ll / sumX[m])
        return jnp.stack(out)

    # correctness first
    s0 = jax.tree_util.tree_map(lambda x: x[0], states)
    ref = np.asarray(dense_safe(s0))
    for name, fn in [("dense_nosafe", dense_nosafe),
                     ("sparse_gather", sparse_gather)]:
        got = np.asarray(fn(s0))
        print(f"{name}: max |diff| vs dense_safe = {np.abs(got - ref).max():.3e}")

    def timed(label, fn):
        @jax.jit
        def run(states):
            def one(s):
                def body(i, acc):
                    out = fn(s._replace(lam=s.lam + acc * 1e-20))
                    return acc + jnp.sum(out) * 1e-20

                return jax.lax.fori_loop(0, CH, body, jnp.float32(0.0))

            return jax.vmap(one)(states)

        out = run(states)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(states))
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:<16s} {best / CH * 1e3:8.3f} ms/eval")

    print(f"platform={jax.devices()[0].platform} R={R} chain={CH}")
    timed("dense_safe", dense_safe)
    timed("dense_nosafe", dense_nosafe)
    timed("sparse_gather", sparse_gather)


if __name__ == "__main__":
    main()
