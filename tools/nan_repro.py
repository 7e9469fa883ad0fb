"""Root-cause a NaN restart lane: single-lane refit with per-iteration probes.

Lane 20 of the benchmark's key (147959412) diverges to all-NaN lam/nu in
float32. Re-run that single restart with a host loop, printing per-iteration
extrema so the first non-finite step is visible.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multimodalmusig_tpu.utils.hermetic import force_cpu

if os.environ.get("NAN_REPRO_TPU", "0") != "1":
    force_cpu()

import jax
import jax.numpy as jnp

from multimodalmusig_tpu.models import mmctm as mmod
from multimodalmusig_tpu.models.ctm_base import counts_per_doc
from multimodalmusig_tpu.models.mmctm import MMCTMConfig, init_with_alpha
from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv
from multimodalmusig_tpu.utils.data import brca_counts_path


def main(lane=20, iters=1000):
    Xnp = []
    for fname in ("brca-eu_snv_counts.tsv", "brca-eu_sv_counts.tsv"):
        counts, _, _ = read_counts_tsv(brca_counts_path(fname))
        Xnp.append(counts.T)
    D = Xnp[0].shape[0]
    config = MMCTMConfig(
        K=(7, 7), V=(Xnp[0].shape[1], Xnp[1].shape[1]), D=D, dtype=jnp.float32
    )
    X = tuple(jnp.asarray(x, jnp.float32) for x in Xnp)
    alpha = jnp.asarray([0.1, 0.1], jnp.float32)
    keys = jax.random.split(jax.random.key(147959412), 100)
    state = init_with_alpha(keys[lane], config, X, alpha)
    N = counts_per_doc(X)
    step = jax.jit(mmod.fit_step_fn(X, N, config))

    prev_ll = None
    for it in range(iters):
        state, ll = step(state)
        lam = np.asarray(state.lam)
        nu = np.asarray(state.nu)
        llv = np.asarray(ll)
        bad = (~np.isfinite(lam).all(axis=1)) | (~np.isfinite(nu).all(axis=1))
        if it % 20 == 0 or bad.any() or not np.isfinite(llv).all():
            print(
                f"it={it:4d} ll={llv} max|lam|={np.abs(lam).max():.4g} "
                f"max nu={nu.max():.4g} min nu={nu.min():.4g} "
                f"minSigEig~diag={np.diagonal(np.asarray(state.Sigma)).min():.4g} "
                f"bad_docs={np.nonzero(bad)[0][:8].tolist()}"
            )
        if bad.any():
            d = int(np.nonzero(bad)[0][0])
            print(f"first bad doc {d}: lam={lam[d]} nu={nu[d]}")
            print(f"zeta={np.asarray(state.zeta)[d]}")
            print(f"Sigma diag={np.diagonal(np.asarray(state.Sigma))}")
            print(f"invSigma finite={np.isfinite(np.asarray(state.invSigma)).all()}")
            break
        if prev_ll is not None and np.all(llv == prev_ll):
            pass
        prev_ll = llv


if __name__ == "__main__":
    main(lane=int(sys.argv[1]) if len(sys.argv) > 1 else 20)
