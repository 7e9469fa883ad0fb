"""Locator for the bundled BRCA-EU dataset.

The reference ships `data/brca-eu_snv_counts.tsv` (96 SNV terms x 560
samples) and `data/brca-eu_sv_counts.tsv` (48 SV terms) — the flagship
workload of its README (reference README.md:7-20). This repo bundles the
same two BSD-2-licensed TSVs under `data/` at the repository root so a bare
checkout runs every example, test, and benchmark without the upstream
checkout mounted; when the upstream mount is present it serves as fallback.
"""

from __future__ import annotations

import os

__all__ = ["brca_data_dir", "brca_counts_path", "BRCA_FILES"]

BRCA_FILES = ("brca-eu_snv_counts.tsv", "brca-eu_sv_counts.tsv")

# repo checkout layout: <repo>/multimodalmusig_tpu/utils/data.py -> <repo>/data
_REPO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)
_REFERENCE_DATA = "/root/reference/data"


def brca_data_dir() -> str:
    """Directory holding the BRCA-EU count TSVs: the in-repo `data/` bundle
    first, the read-only upstream mount as fallback. Returns the in-repo
    path even when neither exists (callers get a clean FileNotFoundError
    naming the expected location)."""
    for cand in (os.environ.get("MUSIG_DATA_DIR"), _REPO_DATA, _REFERENCE_DATA):
        if cand and os.path.isfile(os.path.join(cand, BRCA_FILES[0])):
            return cand
    return _REPO_DATA


def brca_counts_path(name: str) -> str:
    """Full path of one bundled TSV (e.g. 'brca-eu_snv_counts.tsv')."""
    return os.path.join(brca_data_dir(), name)
