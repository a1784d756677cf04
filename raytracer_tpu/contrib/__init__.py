"""Quarantined kernel generations (ADR: PERF_NOTES.md round 4).

Superseded Jacobi circulant kernels kept for provenance and as
independent cross-checks, NOT production or fallback paths:

  * pallas_circulant -- generation-1 lane-gather kernel (per-sweep grid
    launch); superseded by the gather-free diagonal designs.
  * fused_circulant  -- whole-solve-in-one-kernel experiment
    (VMEM-resident); measured neutral vs the launch-per-sweep form and
    capped by VMEM.

Production = ops/sweep_theta.py; load-bearing fallbacks = ops/wrapped_t
(exact-wrap Jacobi reference + unsupported-wrap rerouting target) and
ops/stream_t (HBM-streamed, no VMEM ceiling).  `AnnulusSolver`'s
'pallas'/'fused' methods still resolve here for API compatibility.
"""
