"""Model selection: choose signature counts K by held-out log-likelihood.

The reference provides the primitive (`fit_heldout`, src/MMCTM.jl:554-586 —
"used for held-out perplexity evaluation", SURVEY.md §3.3) but leaves the
selection loop to the user. This module packages the standard workflow:
split samples, fit candidate K values (optionally with multi-restart
selection), score each on the held-out split, return the curve.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

__all__ = ["train_test_split_docs", "heldout_ll_curve", "select_k_mmctm"]


def train_test_split_docs(X: Sequence, test_fraction: float = 0.2, seed: int = 0):
    """Split documents (samples) into train/test lists."""
    rng = np.random.default_rng(seed)
    D = len(X)
    n_test = max(1, int(round(D * test_fraction)))
    perm = rng.permutation(D)
    test_idx = set(perm[:n_test].tolist())
    train = [X[d] for d in range(D) if d not in test_idx]
    test = [X[d] for d in range(D) if d in test_idx]
    return train, test


def heldout_ll_curve(
    k_values: Sequence[Sequence[int]],
    X_train,
    X_test,
    alpha: Sequence[float],
    restarts: int = 10,
    maxiter: int = 500,
    heldout_maxiter: int = 100,
    seed: int = 0,
    verbose: bool = False,
    compact_schedule=None,
) -> List[Tuple[List[int], List[float]]]:
    """For each candidate K vector, fit MMCTM on X_train (multi-restart when
    restarts > 1) and evaluate per-modality held-out log-likelihood on
    X_test via fit_heldout. Returns [(K, heldout_ll per modality), ...].

    `compact_schedule` is forwarded to fit_mmctm_restarts — pass "auto" for
    the zero-config folded-pilot straggler compaction (worthwhile when the
    K sweep runs many restarts per candidate)."""
    from .models.mmctm import MMCTM, fit_heldout
    from .parallel.restarts import fit_mmctm_restarts
    from .utils.formatting import infer_vocab_size

    # vocabulary sized over BOTH splits: a term present only in held-out
    # documents must still have a row in the trained topics, or fit_heldout
    # would reject its index
    M = len(X_train[0])
    V = [
        max(
            infer_vocab_size([doc[m] for doc in X_train]),
            infer_vocab_size([doc[m] for doc in X_test]),
        )
        for m in range(M)
    ]

    curve = []
    for k in k_values:
        k = list(k)
        if restarts > 1:
            model = fit_mmctm_restarts(
                k, list(alpha), X_train, V=V, restarts=restarts,
                maxiter=maxiter, seed=seed,
                compact_schedule=compact_schedule,
            )
        else:
            model = MMCTM(k, list(alpha), V, X_train, seed=seed)
            model.fit(maxiter=maxiter, verbose=False)
        heldout = fit_heldout(X_test, model, maxiter=heldout_maxiter)
        curve.append((k, list(np.asarray(heldout.ll, dtype=np.float64))))
        if verbose:
            print(f"K={k}: heldout ll = {curve[-1][1]}")
    return curve


def select_k_mmctm(
    k_values: Sequence[Sequence[int]],
    X,
    alpha: Sequence[float],
    test_fraction: float = 0.2,
    **kwargs,
):
    """Convenience: split, sweep K, pick the candidate with the best mean
    held-out log-likelihood. Returns (best_k, curve)."""
    X_train, X_test = train_test_split_docs(X, test_fraction, kwargs.get("seed", 0))
    curve = heldout_ll_curve(k_values, X_train, X_test, alpha, **kwargs)
    best_k, _ = max(curve, key=lambda kv: float(np.mean(kv[1])))
    return best_k, curve
