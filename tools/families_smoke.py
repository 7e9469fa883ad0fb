"""TPU smoke: every model family (LDA, ILDA, MMCTM-as-CTM, IMMCTM) fits the
real bundled BRCA-EU data on the default device with finite trajectories —
hardware validation beyond the MMCTM-only benchmark (bench.py). The ILDA/
IMMCTM arms factorize the SNV vocabulary into (substitution, trinucleotide
context) features and the SV vocabulary into (type, size/region) features,
the same shape of factorization the reference's fixtures use
(test/ilda.jl:4-22, test/immctm.jl:6-51).

Walls include compile. Results recorded in BENCH_LOCAL.json
families_tpu_smoke_r4 (round 4, v5e via tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
import pandas as pd
import multimodalmusig_tpu as mm
from multimodalmusig_tpu.utils.data import brca_counts_path

snv = pd.read_csv(brca_counts_path("brca-eu_snv_counts.tsv"), sep="\t")
sv  = pd.read_csv(brca_counts_path("brca-eu_sv_counts.tsv"), sep="\t")
cols = list(snv.columns[1:])
out = {"platform": jax.devices()[0].platform}

t0 = time.perf_counter()
lda = mm.LDA(7, 0.1, 0.1, mm.format_counts_lda(snv, cols))
ll = np.asarray(lda.fit(maxiter=200, tol=1e-5, verbose=False))
out["lda"] = {"iters": len(ll), "final_ll": float(ll[-1]),
              "finite": bool(np.isfinite(ll).all()),
              "wall_s": round(time.perf_counter() - t0, 2)}

# ILDA: SNV vocab factorized into (substitution, context) features the way
# the reference's test fixture factorizes its vocabulary
terms = snv["term"].tolist()
subs = sorted({t.split("[")[1].split("]")[0] for t in terms})
ctx = sorted({t.split("[")[0] + "_" + t.split("]")[1] for t in terms})
feats = np.array([[subs.index(t.split("[")[1].split("]")[0]) + 1,
                   ctx.index(t.split("[")[0] + "_" + t.split("]")[1]) + 1]
                  for t in terms])
t0 = time.perf_counter()
ilda = mm.ILDA(7, 0.1, 0.1, feats, mm.format_counts_lda(snv, cols))
ll = np.asarray(ilda.fit(maxiter=200, tol=1e-5, verbose=False))
out["ilda"] = {"iters": len(ll), "final_ll": float(ll[-1]),
               "finite": bool(np.isfinite(ll).all()),
               "wall_s": round(time.perf_counter() - t0, 2)}

X = mm.format_counts_mmctm([snv, sv], cols)
sv_terms = sv["term"].tolist()
svt = sorted({t.split(":")[0] for t in sv_terms})
svr = sorted({":".join(t.split(":")[1:]) for t in sv_terms})
feats_sv = np.array([[svt.index(t.split(":")[0]) + 1,
                      svr.index(":".join(t.split(":")[1:])) + 1]
                     for t in sv_terms])
t0 = time.perf_counter()
immctm = mm.IMMCTM([7, 7], [0.1, 0.1], [feats, feats_sv], X)
ll = np.asarray(immctm.fit(maxiter=100, verbose=False))
out["immctm"] = {"iters": ll.shape[0], "final_ll": [float(v) for v in ll[-1]],
                 "finite": bool(np.isfinite(ll).all()),
                 "wall_s": round(time.perf_counter() - t0, 2)}

t0 = time.perf_counter()
ctm = mm.CTM(7, 0.1, mm.format_counts_ctm(snv, cols))
ll = np.asarray(ctm.fit(maxiter=100, verbose=False))
out["ctm"] = {"iters": ll.shape[0], "final_ll": [float(v) for v in ll[-1]],
              "finite": bool(np.isfinite(ll).all()),
              "wall_s": round(time.perf_counter() - t0, 2)}
print(json.dumps(out))
