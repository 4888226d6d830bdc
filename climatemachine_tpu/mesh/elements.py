"""1-D spectral-element operators on Legendre-Gauss-Lobatto nodes.

Scope of reference ``src/Numerics/Mesh/Elements.jl`` (lglpoints :11,
baryweights :34, spectralderivative, interpolationmatrix) — reimplemented
from the standard formulas (Kopriva 2009; Berrut & Trefethen 2004).

All element setup runs in numpy float64 on the host; device code receives
the resulting small dense matrices cast to the run dtype.
"""

from __future__ import annotations

import numpy as np


def lgl_points(n_poly: int) -> tuple[np.ndarray, np.ndarray]:
    """(N+1) Legendre-Gauss-Lobatto nodes and quadrature weights on [-1, 1].

    Nodes are the roots of (1-x^2) P'_N(x); weights w_j = 2/(N(N+1) P_N(x_j)^2).
    Newton iteration from the Chebyshev-Gauss-Lobatto initial guess.
    """
    assert n_poly >= 0
    n = n_poly
    if n == 0:
        # finite-volume limit: one cell-centered node carrying the full
        # reference-cell weight (reference DGFV polyorder_vert = 0)
        return np.array([0.0]), np.array([2.0])
    if n == 1:
        return np.array([-1.0, 1.0]), np.array([1.0, 1.0])
    # initial guess: Chebyshev-Gauss-Lobatto points
    x = -np.cos(np.pi * np.arange(n + 1) / n)
    # Newton on q(x) = P'_N, via the Legendre Vandermonde recurrence
    x_old = np.full_like(x, 2.0)
    P = np.zeros((n + 1, n + 1))
    for _ in range(200):
        if np.max(np.abs(x - x_old)) < 1e-15:
            break
        x_old = x.copy()
        P[:, 0] = 1.0
        P[:, 1] = x
        for k in range(2, n + 1):
            P[:, k] = ((2 * k - 1) * x * P[:, k - 1] - (k - 1) * P[:, k - 2]) / k
        # Newton update for interior extrema of P_N (fixed endpoints stay put)
        x = x_old - (x * P[:, n] - P[:, n - 1]) / ((n + 1) * P[:, n])
    w = 2.0 / (n * (n + 1) * P[:, n] ** 2)
    x[0], x[-1] = -1.0, 1.0
    return x, w


def gl_points(n_poly: int) -> tuple[np.ndarray, np.ndarray]:
    """(N+1) Gauss-Legendre nodes/weights (no endpoints), via Golub-Welsch."""
    return np.polynomial.legendre.leggauss(n_poly + 1)


def bary_weights(r: np.ndarray) -> np.ndarray:
    """Barycentric weights for nodes ``r`` (Berrut & Trefethen 2004 eq. 3.2)."""
    diff = r[:, None] - r[None, :]
    np.fill_diagonal(diff, 1.0)
    return 1.0 / np.prod(diff, axis=1)


def derivative_matrix(r: np.ndarray, wb: np.ndarray | None = None) -> np.ndarray:
    """Spectral differentiation matrix D with D[j,k] = l'_k(r_j)."""
    if wb is None:
        wb = bary_weights(r)
    n = len(r)
    D = np.zeros((n, n))
    for j in range(n):
        for k in range(n):
            if j != k:
                D[j, k] = (wb[k] / wb[j]) / (r[j] - r[k])
        D[j, j] = -np.sum(D[j, :])
    # exact row-sum-zero by construction above; restore diagonal identity
    # D[j,j] = sum_{l!=j} 1/(r_j - r_l)
    for j in range(n):
        D[j, j] = np.sum([1.0 / (r[j] - r[l]) for l in range(n) if l != j])
    return D


def interpolation_matrix(r_src: np.ndarray, r_dst: np.ndarray,
                         wb_src: np.ndarray | None = None) -> np.ndarray:
    """Polynomial interpolation matrix from nodes ``r_src`` to ``r_dst``
    (barycentric form; rows hitting a source node exactly become unit rows)."""
    if wb_src is None:
        wb_src = bary_weights(r_src)
    n_dst, n_src = len(r_dst), len(r_src)
    I = np.zeros((n_dst, n_src))
    for k in range(n_dst):
        hit = np.nonzero(np.isclose(r_dst[k], r_src, rtol=0, atol=1e-14))[0]
        if hit.size:
            I[k, hit[0]] = 1.0
            continue
        row = wb_src / (r_dst[k] - r_src)
        I[k, :] = row / np.sum(row)
    return I


def legendre_vandermonde(r: np.ndarray, n_poly: int, normalized: bool = True) -> np.ndarray:
    """Vandermonde of Legendre polynomials P_0..P_N at nodes ``r``.

    Used by the modal filters (reference ``Filters.jl`` spectral_filter_matrix).
    """
    npts = len(r)
    V = np.zeros((npts, n_poly + 1))
    V[:, 0] = 1.0
    if n_poly >= 1:
        V[:, 1] = r
    for k in range(2, n_poly + 1):
        V[:, k] = ((2 * k - 1) * r * V[:, k - 1] - (k - 1) * V[:, k - 2]) / k
    if normalized:
        V *= np.sqrt(np.arange(n_poly + 1) + 0.5)[None, :]
    return V
