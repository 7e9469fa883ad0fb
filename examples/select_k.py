"""Example: choose the number of signatures K by held-out log-likelihood.

    python examples/select_k.py [--data-dir DIR] [--restarts N]

Sweeps MMCTM K candidates on a train split of the BRCA-EU cohort and scores
each on held-out samples (the reference provides fit_heldout as the
primitive; this is the standard selection loop around it).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multimodalmusig_tpu.model_selection import select_k_mmctm
from multimodalmusig_tpu.utils.fast_tsv import read_counts_tsv
from multimodalmusig_tpu.utils.formatting import make_count_matrix
from multimodalmusig_tpu.utils.data import brca_data_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None,
        help="counts directory (default: the bundled data/ TSVs)")
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--samples", type=int, default=120)
    args = ap.parse_args()
    if args.data_dir is None:
        args.data_dir = brca_data_dir()

    snv, _, samples = read_counts_tsv(os.path.join(args.data_dir, "brca-eu_snv_counts.tsv"))
    sv, _, _ = read_counts_tsv(os.path.join(args.data_dir, "brca-eu_sv_counts.tsv"))
    n = min(args.samples, len(samples))
    X = [
        [make_count_matrix(snv[:, d]), make_count_matrix(sv[:, d])]
        for d in range(n)
    ]

    candidates = [[4, 4], [7, 7], [10, 10]]
    best_k, curve = select_k_mmctm(
        candidates, X, [0.1, 0.1], test_fraction=0.2,
        restarts=args.restarts, maxiter=300, heldout_maxiter=100, verbose=True,
    )
    print("\nheld-out log-likelihood curve:")
    for k, ll in curve:
        print(f"  K={k}: {[round(v, 5) for v in ll]}")
    print(f"selected K = {best_k}")


if __name__ == "__main__":
    main()
