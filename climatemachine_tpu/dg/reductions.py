"""Global reductions over DG state.

Scope of reference ``src/Arrays/MPIStateArrays.jl`` reductions: ``norm``
(:583), ``dot`` (:608), ``euclidean_distance`` (:628), ``weightedsum``
(:655) — each an on-rank reduction + MPI.Allreduce.

TPU-native: plain jnp reductions.  Under ``jit`` with sharded operands,
XLA inserts the cross-device ``psum`` automatically (the deterministic
tree order replaces the reference's Allreduce; see SURVEY §2.13).
"""

from __future__ import annotations

import jax.numpy as jnp


def weightedsum(grid, q, field=None):
    """∫ q dV per field (mass-matrix-weighted sum; reference :655)."""
    w = grid.M[..., None]
    x = q if field is None else q[..., field:field + 1]
    out = jnp.sum(w * x, axis=tuple(range(x.ndim - 1)))
    return out[0] if field is not None else out


def norm(grid, q, weighted: bool = True):
    """L2 norm of the full state (reference :583)."""
    if weighted:
        return jnp.sqrt(jnp.sum(grid.M[..., None] * q * q))
    return jnp.sqrt(jnp.sum(q * q))


def dot(grid, a, b, weighted: bool = True):
    if weighted:
        return jnp.sum(grid.M[..., None] * a * b)
    return jnp.sum(a * b)


def euclidean_distance(grid, a, b, weighted: bool = True):
    """||a - b||_M (reference :628)."""
    return norm(grid, a - b, weighted=weighted)
