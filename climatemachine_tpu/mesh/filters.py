"""Spectral modal filters + positivity filter.

Scope of reference ``src/Numerics/Mesh/Filters.jl``: spectral_filter_matrix
(:114), ExponentialFilter (:172), BoydVandevenFilter (:231), CutoffFilter
(:275), MassPreservingCutoffFilter (:316), TMARFilter (:369), filter
targets (:26), apply! (:408) and the GPU kernels (:651, :794).

TPU-first: a modal filter is a per-dimension small matrix contracted over
the element tensor-product axes — identical structure to the derivative
contractions, so it runs as batched MXU matmuls; TMAR is a clip + per-
element weighted rescale (two reductions), pure VPU code.  Filters are
pure functions ``q -> q_filtered``; direction selection mirrors the
reference's horizontal/vertical split.
"""

from __future__ import annotations

import math

import jax
from typing import Callable, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import (EVERY, _apply_D, _to_block,
                                           _to_flat, direction_dims)


# --- filter matrices (host, f64) -------------------------------------------

def _legendre_vandermonde(r: np.ndarray) -> np.ndarray:
    """Orthonormal Legendre Vandermonde at points r (reference
    GaussQuadrature.orthonormal_poly usage, Filters.jl:153-154)."""
    N = len(r) - 1
    V = np.zeros((N + 1, N + 1))
    # recurrence for orthonormal Legendre on [-1, 1]
    P_prev = np.ones_like(r) / math.sqrt(2.0)
    V[:, 0] = P_prev
    if N >= 1:
        P = r * math.sqrt(3.0 / 2.0)
        V[:, 1] = P
        for n in range(1, N):
            a = math.sqrt((2 * n + 1) * (2 * n + 3)) / (n + 1)
            b = n / (n + 1) * math.sqrt((2 * n + 3) / (2 * n - 1))
            P_next = a * r * V[:, n] - b * V[:, n - 1]
            V[:, n + 1] = P_next
    return V


def spectral_filter_matrix(r: np.ndarray, Nc: int,
                           sigma: Callable[[float], float]) -> np.ndarray:
    """V diag(Σ) V⁻¹ with Σ[i] = σ((i-Nc)/(N-Nc)) for i >= Nc
    (reference Filters.jl:114-126)."""
    N = len(r) - 1
    if Nc > N:
        return np.eye(N + 1)
    V = _legendre_vandermonde(np.asarray(r, dtype=np.float64))
    S = np.ones(N + 1)
    denom = max(N - Nc, 1)
    for i in range(Nc, N + 1):
        S[i] = sigma((i - Nc) / denom)
    return V @ np.diag(S) @ np.linalg.inv(V)


def modified_filter_matrix(r: np.ndarray, Nc: int,
                           sigma: Callable[[float], float]) -> np.ndarray:
    """Like spectral_filter_matrix but keeps modes < Nc untouched even when
    Nc > N would request identity (reference :143)."""
    N = len(r) - 1
    V = _legendre_vandermonde(np.asarray(r, dtype=np.float64))
    S = np.ones(N + 1)
    denom = max(N - Nc, 1)
    for i in range(Nc, N + 1):
        S[i] = sigma((i - Nc) / denom)
    return V @ np.diag(S) @ np.linalg.inv(V)


def _normalize_Nc(Nc, dim):
    if isinstance(Nc, int):
        return (Nc,) * dim
    Nc = tuple(Nc)
    if len(Nc) == 2 and dim == 3:
        return (Nc[0], Nc[0], Nc[1])
    return Nc


class SpectralFilter:
    """Per-dimension filter matrices, applied by tensor contraction."""

    def __init__(self, grid, matrices: Sequence[np.ndarray]):
        self.grid = grid
        self.matrices = tuple(jnp.asarray(m, dtype=grid.coords.dtype)
                              for m in matrices)

    def __call__(self, q, direction: str = EVERY):
        g = self.grid
        dims = direction_dims(direction, g.dim)
        xb = _to_block(g, q)
        for d in dims:
            # reuse the D-contraction helper with the filter matrix
            Fd = self.matrices[d]
            axis = g.dim - d
            out = jnp.tensordot(xb, Fd, axes=((axis,), (1,)))
            xb = jnp.moveaxis(out, -1, axis)
        return _to_flat(g, xb)

    def nodal_matrix(self, direction: str = EVERY):
        """The composed [Np, Np] nodal filter operator F (out = F q per
        element per variable) — the whole per-dimension contraction
        chain collapsed into ONE matmul operand, for the var-major fast
        paths.  Built eagerly in numpy (never inside a trace) and
        cached."""
        cache = getattr(self, "_nodal_cache", None)
        if cache is None:
            cache = self._nodal_cache = {}
        if direction not in cache:
            g = self.grid
            xb = np.eye(g.Np).reshape(tuple(g.Nq[::-1]) + (g.Np,))
            for d in direction_dims(direction, g.dim):
                Fd = np.asarray(self.matrices[d], dtype=np.float64)
                axis = g.dim - 1 - d
                out = np.tensordot(xb, Fd, axes=((axis,), (1,)))
                xb = np.moveaxis(out, -1, axis)
            cache[direction] = xb.reshape(g.Np, g.Np)
        return cache[direction]

    def apply_vm(self, qv, direction: str = EVERY):
        """Var-major apply: qv [E, n, Np] -> filtered, one MXU matmul."""
        E, n, Np = qv.shape
        F = jnp.asarray(self.nodal_matrix(direction), dtype=qv.dtype)
        out = jnp.matmul(qv.reshape(E * n, Np), F.T,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(E, n, Np)


class ExponentialFilter(SpectralFilter):
    """σ(η) = exp(-α η^s) above cutoff Nc (reference :172)."""

    def __init__(self, grid, Nc=0, s=32, alpha=None):
        if alpha is None:
            alpha = -math.log(np.finfo(np.float64).eps)
        assert s % 2 == 0
        Ncs = _normalize_Nc(Nc, grid.dim)
        sigma = lambda eta: math.exp(-alpha * eta ** s)
        mats = [spectral_filter_matrix(grid.xi[d], Ncs[d], sigma)
                for d in range(grid.dim)]
        super().__init__(grid, mats)


class BoydVandevenFilter(SpectralFilter):
    """Boyd-Vandeven erfc filter (reference :231)."""

    def __init__(self, grid, Nc=0, s=32):
        assert s % 2 == 0
        Ncs = _normalize_Nc(Nc, grid.dim)

        def sigma(eta):
            a = 2 * abs(eta) - 1
            chi = 1.0 if a == 0 else math.sqrt(
                -math.log1p(-min(a * a, 1 - 1e-15)) / (a * a))
            return math.erfc(math.sqrt(s) * chi * a) / 2

        mats = [spectral_filter_matrix(grid.xi[d], Ncs[d], sigma)
                for d in range(grid.dim)]
        super().__init__(grid, mats)


class CutoffFilter(SpectralFilter):
    """Zero modes >= Nc (reference :275)."""

    def __init__(self, grid, Nc=None):
        if Nc is None:
            Nc = tuple(nq - 1 for nq in grid.Nq)
        Ncs = _normalize_Nc(Nc, grid.dim)
        mats = [spectral_filter_matrix(grid.xi[d], Ncs[d], lambda eta: 0.0)
                for d in range(grid.dim)]
        super().__init__(grid, mats)


class MassPreservingCutoffFilter(SpectralFilter):
    """Cutoff preserving the cell average (reference :316)."""

    def __init__(self, grid, Nc=None):
        if Nc is None:
            Nc = tuple(nq - 1 for nq in grid.Nq)
        Ncs = _normalize_Nc(Nc, grid.dim)
        mats = [modified_filter_matrix(grid.xi[d], Ncs[d], lambda eta: 0.0)
                for d in range(grid.dim)]
        super().__init__(grid, mats)


# --- TMAR positivity --------------------------------------------------------

def tmar(grid, q, fields: Optional[Sequence[int]] = None):
    """Truncation-and-Mass-Aware-Rescaling positivity filter (reference
    TMARFilter :369, kernel :794; Light & Durran 2016): per element, clip
    negatives and rescale so the element integral is preserved."""
    M = grid.M[..., None]                        # [E, Np, 1]
    qc = jnp.maximum(q, 0.0)
    num = jnp.sum(M * q, axis=1, keepdims=True)   # [E, 1, n]
    den = jnp.sum(M * qc, axis=1, keepdims=True)
    scale = jnp.where(den > 0, jnp.maximum(num, 0.0) / jnp.where(den > 0, den, 1.0), 0.0)
    out = qc * scale
    if fields is None:
        return out
    res = q
    for f in fields:
        res = res.at[..., f].set(out[..., f])
    return res


# --- filter targets ---------------------------------------------------------

class FilterTarget:
    """Transform state to/from filter space (reference
    AbstractFilterTarget, Filters.jl:26)."""

    def to_filter(self, q, aux):
        return q

    def from_filter(self, qf, q, aux):
        return qf


class AtmosFilterPerturbations(FilterTarget):
    """Filter perturbations about the hydrostatic reference state
    (reference src/Atmos/Model/filters.jl): ρ and ρe have ref-state values
    subtracted before filtering and restored after."""

    def __init__(self, model):
        self.model = model

    def _ref(self, aux):
        m = self.model
        ref = jnp.zeros(aux.shape[:-1] + (m.prog_spec.num,), dtype=aux.dtype)
        ref = m.prog_spec.set(ref, "rho", m.aux_get(aux, "ref_state.rho"))
        ref = m.prog_spec.set(ref, "rhoe", m.aux_get(aux, "ref_state.rhoe"))
        return ref

    def to_filter(self, q, aux):
        return q - self._ref(aux)

    def from_filter(self, qf, q, aux):
        return qf + self._ref(aux)


class CustomFilter:
    """Pointwise user hook on the prognostic state (reference
    src/Numerics/DGMethods/custom_filter.jl AbstractCustomFilter /
    custom_filter!).  Subclass and implement ``filter(model, q, aux) ->
    q``; apply with :func:`apply_custom_filter`.  Modifying the state this
    way does not guarantee conservation (reference docstring warning)."""

    def filter(self, model, q, aux):
        raise NotImplementedError


def apply_custom_filter(cf: CustomFilter, model, q, aux):
    """(reference custom_filter.jl apply! — pointwise over all real
    elements; here one vectorized call)."""
    return cf.filter(model, q, aux)


def apply_filter(grid, q, filt: SpectralFilter, target: FilterTarget = None,
                 aux=None, direction: str = EVERY,
                 fields: Optional[Sequence[int]] = None):
    """Apply a spectral filter, optionally through a target transform and
    restricted to selected fields (reference Filters.apply!, :408)."""
    x = q if target is None else target.to_filter(q, aux)
    xf = filt(x, direction=direction)
    if fields is not None:
        keep = jnp.zeros((x.shape[-1],), dtype=bool).at[list(fields)].set(True)
        xf = jnp.where(keep, xf, x)
    return xf if target is None else target.from_filter(xf, q, aux)
