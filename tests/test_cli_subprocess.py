"""True CLI surface test: run `python -m multimodalmusig_tpu.cli` as a
subprocess (what a reference user would actually type)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd


from conftest import requires_brca_data


@requires_brca_data
def test_cli_subprocess_end_to_end(tmp_path):
    snv = pd.read_csv("/root/reference/data/brca-eu_snv_counts.tsv", sep="\t")
    sv = pd.read_csv("/root/reference/data/brca-eu_sv_counts.tsv", sep="\t")
    cols = ["term"] + list(snv.columns[1:9])
    snv_path, sv_path = str(tmp_path / "snv.tsv"), str(tmp_path / "sv.tsv")
    snv[cols].to_csv(snv_path, sep="\t", index=False)
    sv[cols].to_csv(sv_path, sep="\t", index=False)

    env = dict(os.environ)
    env.update(
        PYTHONPATH="/root/repo",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_cli",
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "multimodalmusig_tpu.cli",
            snv_path, sv_path,
            "-k", "2", "2", "-m", "SNV", "SV",
            "--restarts", "2", "--maxiter", "8", "--chunk-iters", "4",
            "--sigs", str(tmp_path / "sigs.tsv"),
            "--props", str(tmp_path / "props.tsv"),
            "--verbose",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Log-likelihoods" in out.stdout
    sigs = pd.read_csv(tmp_path / "sigs.tsv", sep="\t")
    assert {"modality", "topic", "term", "probability"} <= set(sigs.columns)
    props = pd.read_csv(tmp_path / "props.tsv", sep="\t")
    assert props.shape == (4, 9)  # 4 topics x (label + 8 samples)
    assert np.isfinite(props.iloc[:, 1:].to_numpy()).all()
