"""Example: the reference README's full workflow on the BRCA-EU cohort.

Covers every model family and the production multi-restart protocol:

    python examples/fit_brca.py [--data-dir DIR] [--restarts N]

(README.md:20-84 of the reference shows the Julia equivalents.)
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import multimodalmusig_tpu as mm
from multimodalmusig_tpu.parallel.restarts import fit_ilda_restarts, fit_lda_restarts
from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv
from multimodalmusig_tpu.utils.formatting import make_count_matrix
from multimodalmusig_tpu.utils.data import brca_data_dir


def snv_features(terms):
    """Factorize SNV terms like 'A[C->A]A' into (substitution, 5', 3')."""
    subs, fives, threes, rows = {}, {}, {}, []
    for t in terms:
        f5, ref, alt, f3 = re.match(r"(\w)\[(\w)->(\w)\](\w)", t).groups()
        rows.append(
            [
                subs.setdefault(f"{ref}>{alt}", len(subs) + 1),
                fives.setdefault(f5, len(fives) + 1),
                threes.setdefault(f3, len(threes) + 1),
            ]
        )
    return np.asarray(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None,
        help="counts directory (default: the bundled data/ TSVs)")
    ap.add_argument("--restarts", type=int, default=20)
    args = ap.parse_args()
    if args.data_dir is None:
        args.data_dir = brca_data_dir()

    snv, snv_terms, samples = read_counts_tsv(
        os.path.join(args.data_dir, "brca-eu_snv_counts.tsv")
    )
    sv, sv_terms, _ = read_counts_tsv(
        os.path.join(args.data_dir, "brca-eu_sv_counts.tsv")
    )
    print(f"{len(samples)} samples; SNV {snv.shape[0]} terms, SV {sv.shape[0]} terms")

    X_lda = [make_count_matrix(snv[:, d]) for d in range(len(samples))]
    X_mm = [
        [make_count_matrix(snv[:, d]), make_count_matrix(sv[:, d])]
        for d in range(len(samples))
    ]

    # --- LDA, best of N restarts (README.md:75-84) ---
    lda = fit_lda_restarts(7, 0.1, 0.1, X_lda, restarts=args.restarts, maxiter=300)
    print(f"LDA(7): ll={lda.ll:.5f} elbo={lda.elbo:.0f} converged={lda.converged}")

    # --- ILDA with real term factorization ---
    ilda = fit_ilda_restarts(
        7, 0.1, 0.1, snv_features(snv_terms), X_lda, restarts=max(args.restarts // 2, 2),
        maxiter=300,
    )
    print(f"ILDA(7): ll={ilda.ll:.5f}")

    # --- CTM = single-modality MMCTM (README.md:67-73) ---
    ctm = mm.CTM(7, 0.1, [[doc[0]] for doc in X_mm])
    ctm.fit(maxiter=100, verbose=False)
    print(f"CTM(7): ll={ctm.ll}")

    # --- flagship MMCTM with the CLI's two-stage restart protocol ---
    model = mm.fit_mmctm_restarts(
        [7, 7], [0.1, 0.1], X_mm, restarts=args.restarts, maxiter=500, verbose=False
    )
    print(f"MMCTM([7,7]): ll={model.ll} elbo={model.elbo:.0f}")

    # cross-modality signature correlation (the model's headline output)
    Sigma = model.Sigma
    corr = Sigma / np.sqrt(np.outer(np.diag(Sigma), np.diag(Sigma)))
    i, j = np.unravel_index(np.abs(corr[:7, 7:]).argmax(), (7, 7))
    print(
        f"strongest SNV<->SV signature correlation: SNV-{i + 1} x SV-{j + 1} "
        f"= {corr[i, 7 + j]:.3f}"
    )

    # predict SV activity from SNV counts alone for the first 5 samples
    eta = mm.predict_modality_eta([[doc[0]] for doc in X_mm[:5]], 2, model, maxiter=50)
    print("predicted SV eta, sample 1:", np.round(eta[0], 2))

    # checkpoint
    mm.save_model("/tmp/brca_mmctm.npz", model)
    print("checkpoint written to /tmp/brca_mmctm.npz")


if __name__ == "__main__":
    main()
