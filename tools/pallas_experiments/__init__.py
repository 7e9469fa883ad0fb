"""Demoted Pallas kernel experiments (round-5 verdict decision).

These kernels are CORRECT (interpret-mode parity tests still run from
tests/test_pallas_kernels.py) but measured SLOWER than the XLA paths they
were built to beat, at every operating point since the exp-factorized
E-step landed:

- theta_kernel.theta_moments_fused: 1.44 s vs 1.10 s end-to-end on the
  100-restart BRCA fit (round 2) — XLA keeps θ fused at per-lane sizes and
  the per-modality kernel launches under the vmap batching rule cost more
  than they save.
- estep_kernel.estep_eta_fused (ζ/Ndivζ/ν/λ in one launch): tied the
  λ-only kernel at 2x its Mosaic compile time (rounds 2-4), and at the
  round-5 cg=4 operating point LOSES outright: 0.48 s vs 0.44 s XLA vs
  0.36 s λ-only (tools/pallas_fit_ab.py 100 — BENCH_LOCAL pallas_ab_r5).

The winning kernel — the fused λ Newton solve, 1.24x end-to-end — remains
in the package (multimodalmusig_tpu/ops/pallas/lambda_kernel.py,
default-on on single-chip TPU). Keep these for the record and as starting
points if the operating point ever shifts back toward fusion (e.g. much
larger MK or V > 128 vocabularies).
"""
