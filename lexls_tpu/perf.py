"""Roofline accounting: algorithmic FLOPs of one active-set solve.

Counts the *useful* floating-point work of the reference algorithm (the
math any implementation must do — Householder panel + Gauss elimination
per ``lexlse.h:117-506``, back-substitution solve ``:1015-1045``, and
the multiplier back-propagation ``:611-762``), NOT the masked/one-hot
overhead our static-shape realization adds.  Dividing measured
throughput by these FLOPs gives an honest model-flops-utilization (MFU)
figure and locates the workload on the chip roofline; BASELINE.md's
"kernel efficiency" row asks exactly for this.

Peak numbers (TPU v5e, per chip): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s
float32 (MXU multi-pass), ~0.8 TB/s HBM.  The solver's hot loop is
mostly float32 VPU work on (dim, n) panels, so the *achievable* ceiling
sits far below MXU peak — the VPU line (8x128 lanes x ~0.94 GHz x 2
FLOP/MAC ~= 1.9 TFLOP/s f32) is the relevant roof for the panel phase.
"""

from __future__ import annotations

from typing import Dict, Sequence

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32_MXU = 49e12
V5E_PEAK_F32_VPU = 1.9e12
V5E_HBM_BYTES_S = 0.8e12


def factorize_flops(n: int, dims: Sequence[int]) -> float:
    """FLOPs of one l-QR factorization (reference ``lexlse.h:117-506``),
    assuming full per-level ranks (the common case for warm solves on
    well-conditioned data).  Per accepted pivot step the Householder
    reflection updates the remaining rows of the level over the trailing
    columns (~4 d_rem c_rem FLOPs) plus the norm downdate; per level the
    Gauss elimination forms L = B R^{-1} and the trailing update."""
    total = 0.0
    m = sum(dims)
    fc = 0  # columns consumed so far
    rows_below = m
    for dim in dims:
        K = min(dim, max(n - fc, 0))
        rows_below -= dim
        # panel: step j reflects rows j..dim-1 over trailing cols + rhs
        for j in range(K):
            d_rem = dim - j
            c_rem = (n - fc - j) + 1
            total += 4.0 * d_rem * c_rem   # w = u^T B; B -= tau u w
            total += 2.0 * d_rem           # column-norm bookkeeping
            total += 2.0 * (n - fc - j)    # norm downdate
        # Gauss elimination of lower-priority rows (L = B R^{-1}, update)
        if rows_below > 0 and K > 0:
            total += rows_below * K * K            # triangular solve
            total += 2.0 * rows_below * K * ((n - fc - K) + 1)
        fc += K
        if fc >= n:
            break
    return total


def solve_flops(n: int) -> float:
    """Back-substitution through the gathered staircase (~n^2)."""
    return float(n * n)


def sweep_flops(n: int, dims: Sequence[int]) -> float:
    """All-objective multiplier back-propagation: per level k, a
    Householder replay over the p-k higher-level right-hand sides
    (4 d K each) plus the coupling product (2 (p-k) d n)."""
    p = len(dims)
    total = 0.0
    fc = 0
    for k, dim in enumerate(dims):
        K = min(dim, max(n - fc, 0))
        nrhs = p - k
        total += 4.0 * nrhs * dim * K
        total += 2.0 * nrhs * dim * n
        fc += K
    return total


def iteration_flops(n: int, dims: Sequence[int]) -> float:
    """One active-set iteration: factorize + solve + ratio test + sweep
    (the sweep runs on non-blocking iterations; counting it every
    iteration slightly over-credits MFU on blocking-heavy solves)."""
    m = sum(dims)
    return (factorize_flops(n, dims) + solve_flops(n)
            + 2.0 * m * n          # A dx
            + 6.0 * m              # ratio test
            + sweep_flops(n, dims))


def mfu_report(solves_per_s: float, n: int, dims: Sequence[int],
               mean_iterations: float) -> Dict[str, float]:
    """Achieved algorithmic FLOP/s and utilization vs the v5e roofs."""
    per_solve = iteration_flops(n, dims) * mean_iterations
    flops_s = solves_per_s * per_solve
    # minimal HBM traffic: read A once, write x + active set once
    m = sum(dims)
    bytes_per_solve = 4.0 * (m * n + 2 * m + n)
    return {
        "flops_per_solve": per_solve,
        "flops_per_s": flops_s,
        "mfu_vs_bf16_peak": flops_s / V5E_PEAK_BF16,
        "mfu_vs_f32_mxu": flops_s / V5E_PEAK_F32_MXU,
        "mfu_vs_f32_vpu": flops_s / V5E_PEAK_F32_VPU,
        "hbm_fraction": solves_per_s * bytes_per_solve / V5E_HBM_BYTES_S,
    }
