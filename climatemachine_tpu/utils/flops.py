"""Analytic FLOP budget for the Held-Suarez p4 hot path.

Counts the matmul FLOPs of every pass of the benchmark RHS from the
static config (2·M·N·K per [M,K]x[K,N] matmul) plus the leading
elementwise terms, so the bench and PERF_NOTES can report achieved
TFLOP/s and %-of-chip next to every measured number (VERDICT r2 #10).

The reference ships no such accounting; the concept matches its
``monitor_timestep_duration`` wall-clock instrumentation
(src/Driver/Callbacks/Callbacks.jl:224-271) extended with a static
work model.
"""

from __future__ import annotations

# v5e peak estimates used for the MFU column (measured streaming
# ceiling and dot throughput recorded in PERF_NOTES.md)
V5E_F32_HIGHEST_TFLOPS = 49.0
V5E_BF16_TFLOPS = 197.0


def _mm(M, N, K):
    return 2.0 * M * N * K


def budget(n_horz: int = 16, n_vert: int = 8, poly: int = 4) -> dict:
    """Analytic FLOP counts (in FLOPs) for the benchmark configuration.

    Returns dict with ``rhs`` (one explicit RHS), ``explicit_step``
    (LSRK54 = 5 RHS), ``imex_step`` (ARK2GKC = 3 full RHS + columnwise
    solves/matvecs), and ``gridpoints``.
    """
    E = 6 * n_horz * n_horz * n_vert
    Nq = poly + 1
    Np = Nq ** 3
    Nfp = Nq ** 2
    nface = 6
    X = nface * Nfp
    n = 5                    # prognostic width (dry)
    n_hyper = 4              # chain width (u_h, h_tot)
    F_h = 4 * Nfp            # horizontal-face lanes (chain)

    total = 0.0
    # volume: per-var weak divergence [E·n, 3Np] x [3Np, Np]
    total += _mm(E * n, Np, 3 * Np)
    total += 60.0 * E * Np               # flux/thermo VPU
    # surface: extraction + lift + Rusanov math
    total += _mm(E * 7, X, Np) + _mm(E * n, Np, X)
    total += 80.0 * E * X
    # hyperdiffusion chain: 3 passes of Wcat [E·w, Np] x [Np, nd·Np+F]
    nd = 2                               # horizontal-only chain
    for w in (n_hyper, 3 * n_hyper, n_hyper):
        total += _mm(E * w, nd * Np + F_h, Np)
    total += 2 * _mm(E * 3 * n_hyper, Np, F_h) + _mm(E * n_hyper, Np, F_h)
    # scalar-hyper surface correction
    total += _mm(E * 3 * n, F_h, Np) + _mm(E * n, Np, F_h)
    total += 40.0 * E * Np               # source + aux VPU
    rhs = total

    # IMEX ARK2GKC: 3 full RHS + linear extras + columnwise work
    imex = 3 * rhs
    imex += 3 * (20.0 * E * Np + 30.0 * E * 2 * Nfp)
    ncol = 6 * n_horz * n_horz * Nq * Nq
    nb = Nq * n
    mv = 3 * _mm(ncol, 1, nb) * n_vert   # block-tridiag matvec
    solve = 2 * mv
    imex += 2 * solve + 3 * mv

    return {
        "rhs": rhs,
        "explicit_step": 5 * rhs,
        "imex_step": imex,
        "gridpoints": E * Np,
    }


def mfu_f32(flops: float, seconds: float) -> float:
    """Fraction of the v5e f32-HIGHEST dot-throughput estimate."""
    return flops / seconds / 1e12 / V5E_F32_HIGHEST_TFLOPS
