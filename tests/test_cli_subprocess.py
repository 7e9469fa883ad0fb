"""True CLI surface test: run `python -m multimodalmusig_tpu.cli` as a
subprocess (what a reference user would actually type)."""

import os
import subprocess
import sys

import numpy as np
from multimodalmusig_tpu.utils.data import brca_counts_path
import pandas as pd


from conftest import requires_brca_data


@requires_brca_data
def test_cli_subprocess_end_to_end(tmp_path):
    snv = pd.read_csv(brca_counts_path("brca-eu_snv_counts.tsv"), sep="\t")
    sv = pd.read_csv(brca_counts_path("brca-eu_sv_counts.tsv"), sep="\t")
    cols = ["term"] + list(snv.columns[1:9])
    snv_path, sv_path = str(tmp_path / "snv.tsv"), str(tmp_path / "sv.tsv")
    snv[cols].to_csv(snv_path, sep="\t", index=False)
    sv[cols].to_csv(sv_path, sep="\t", index=False)

    env = dict(os.environ)
    env.update(
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        JAX_PLATFORMS="cpu",
        # persistent compilation cache OFF: jaxlib 0.9.0's XLA:CPU
        # executable (de)serializer can segfault (see conftest.py) and
        # these children compile only tiny 2-topic programs anyway
        JAX_COMPILATION_CACHE_DIR="",
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "multimodalmusig_tpu.cli",
            snv_path, sv_path,
            "-k", "2", "2", "-m", "SNV", "SV",
            "--restarts", "2", "--maxiter", "8", "--chunk-iters", "4",
            "--sigs", str(tmp_path / "sigs.tsv"),
            "--props", str(tmp_path / "props.tsv"),
            "--verbose", "--progress",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Log-likelihoods" in out.stdout
    # --progress with --chunk-iters streams per-chunk completion counts
    # (the reference's restart progress bar analogue, run_mmctm.jl:101-104)
    prog = [l for l in out.stderr.splitlines() if "restarts completed" in l]
    assert any("stage 1" in l for l in prog), out.stderr[-2000:]
    assert any("/2 restarts completed" in l for l in prog)
    sigs = pd.read_csv(tmp_path / "sigs.tsv", sep="\t")
    assert {"modality", "topic", "term", "probability"} <= set(sigs.columns)
    props = pd.read_csv(tmp_path / "props.tsv", sep="\t")
    assert props.shape == (4, 9)  # 4 topics x (label + 8 samples)
    assert np.isfinite(props.iloc[:, 1:].to_numpy()).all()


def test_cli_progress_without_chunking_explains(tmp_path, capsys=None):
    """--progress without --chunk-iters must say why nothing streams
    (unchunked fits are one compiled dispatch), not silently no-op."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "term": ["a", "b", "c"],
            "s1": [3, 1, 0],
            "s2": [0, 2, 4],
            "s3": [1, 1, 1],
        }
    )
    p1, p2 = str(tmp_path / "m1.tsv"), str(tmp_path / "m2.tsv")
    df.to_csv(p1, sep="\t", index=False)
    df.to_csv(p2, sep="\t", index=False)
    env = dict(os.environ)
    env.update(
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        JAX_PLATFORMS="cpu",
        # persistent compilation cache OFF: jaxlib 0.9.0's XLA:CPU
        # executable (de)serializer can segfault (see conftest.py) and
        # these children compile only tiny 2-topic programs anyway
        JAX_COMPILATION_CACHE_DIR="",
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "multimodalmusig_tpu.cli",
            p1, p2, "-k", "2", "2", "-m", "A", "B",
            "--restarts", "2", "--maxiter", "3", "--progress",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "--progress needs --chunk-iters" in out.stderr


@requires_brca_data
def test_cli_auto_compact(tmp_path):
    """--auto-compact runs the pilot, derives (and reports) a schedule, and
    produces a fitted model — the zero-config path (run_mmctm.jl:52)."""
    snv = pd.read_csv(brca_counts_path("brca-eu_snv_counts.tsv"), sep="\t")
    sv = pd.read_csv(brca_counts_path("brca-eu_sv_counts.tsv"), sep="\t")
    cols = ["term"] + list(snv.columns[1:9])
    snv_path, sv_path = str(tmp_path / "snv.tsv"), str(tmp_path / "sv.tsv")
    snv[cols].to_csv(snv_path, sep="\t", index=False)
    sv[cols].to_csv(sv_path, sep="\t", index=False)
    env = dict(os.environ)
    env.update(
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        JAX_PLATFORMS="cpu",
        # persistent compilation cache OFF: jaxlib 0.9.0's XLA:CPU
        # executable (de)serializer can segfault (see conftest.py) and
        # these children compile only tiny 2-topic programs anyway
        JAX_COMPILATION_CACHE_DIR="",
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "multimodalmusig_tpu.cli",
            snv_path, sv_path, "-k", "2", "2", "-m", "SNV", "SV",
            "--restarts", "4", "--maxiter", "12", "--auto-compact",
            "--pilot-restarts", "3",
            "--props", str(tmp_path / "props.tsv"), "--verbose",
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "auto-compact schedule" in out.stderr, out.stderr[-2000:]
    props = pd.read_csv(tmp_path / "props.tsv", sep="\t")
    assert np.isfinite(props.iloc[:, 1:].to_numpy()).all()


def test_cli_auto_compact_mutually_exclusive(tmp_path):
    env = dict(os.environ)
    env.update(PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
               JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable, "-m", "multimodalmusig_tpu.cli",
            "x.tsv", "-k", "2", "-m", "A",
            "--auto-compact", "--compact-at", "50",
        ],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert out.returncode == 1
    assert "mutually exclusive" in out.stderr
