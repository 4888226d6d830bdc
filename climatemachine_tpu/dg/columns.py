"""Vertical column operations: cumulative (stack) integrals and column
broadcasts.

Scope of reference ``src/Numerics/DGMethods/DGModel.jl`` (
indefinite_stack_integral! :445, reverse_indefinite_stack_integral! :489)
and the kernels (DGModel_kernels.jl:1903,:2012); used by the atmosphere
(UpwardIntegrals, e.g. radiation) and the ocean (w and pkin integrals,
hydrostatic_boussinesq_model.jl:668-712).

TPU-first: columns are device-local (stacked-grid invariant), so a stack
integral is (a) a small static antiderivative matrix applied over the
intra-element vertical nodes (one MXU contraction) plus (b) an exclusive
cumsum over the n_vert element layers — no communication, no scan over
nodes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def lagrange_antiderivative_matrix(xi: np.ndarray) -> np.ndarray:
    """I[i, j] = ∫_{-1}^{xi_i} l_j(x) dx for the Lagrange basis at nodes
    xi (host, exact via polynomial antiderivatives)."""
    N = len(xi)
    I = np.zeros((N, N))
    for j in range(N):
        y = np.zeros(N)
        y[j] = 1.0
        coef = np.polynomial.polynomial.polyfit(xi, y, N - 1)
        anti = np.polynomial.polynomial.polyint(coef)
        vals = np.polynomial.polynomial.polyval(xi, anti)
        v0 = np.polynomial.polynomial.polyval(-1.0, anti)
        I[:, j] = vals - v0
    return I


class ColumnOps:
    """Per-grid static operators for stack integrals."""

    def __init__(self, grid):
        assert grid.n_vert is not None, "stack integrals need a stacked grid"
        self.grid = grid
        self.n_vert = grid.n_vert
        self.n_horz = grid.n_horz
        self.Nq = grid.Nq
        xi_v = grid.xi[grid.dim - 1]
        dtype = grid.coords.dtype
        self.Iop = jnp.asarray(lagrange_antiderivative_matrix(xi_v),
                               dtype=dtype)
        self.wv = grid.w[grid.dim - 1]        # 1-D vertical weights

    # --- layout helpers ----------------------------------------------------
    def to_stack(self, x):
        """[E, Np, n] -> [Eh, nv, Nq3, Nq2*Nq1, n]."""
        Nq1, Nq2, Nq3 = self.Nq
        n = x.shape[-1]
        return x.reshape(self.n_horz, self.n_vert, Nq3, Nq2 * Nq1, n)

    def from_stack(self, xs):
        n = xs.shape[-1]
        return xs.reshape(self.n_horz * self.n_vert, self.grid.Np, n)

    # --- integrals ----------------------------------------------------------
    def indefinite_integral(self, f):
        """I(z) = ∫_bottom^z f dz', pointwise cumulative (reference
        indefinite_stack_integral!).  f: [E, Np, n] -> same shape."""
        g = self.grid
        fs = self.to_stack(f * g.JcV[..., None])     # integrand * dz/dξ
        # intra-element cumulative (contraction over vertical nodes)
        cum = jnp.einsum("ij,evjhn->evihn", self.Iop, fs)
        # per-element totals -> exclusive cumsum over layers
        tot = jnp.einsum("j,evjhn->evhn", self.wv, fs)
        offset = jnp.cumsum(tot, axis=1) - tot
        return self.from_stack(cum + offset[:, :, None])

    def reverse_indefinite_integral(self, f):
        """I(z) = ∫_z^top f dz' (reference
        reverse_indefinite_stack_integral!): column total minus forward."""
        fwd = self.indefinite_integral(f)
        tot = self.column_total(f)
        return tot - fwd

    def column_total(self, f):
        """∫_bottom^top f dz broadcast to every node of the column."""
        g = self.grid
        fs = self.to_stack(f * g.JcV[..., None])
        tot = jnp.einsum("j,evjhn->evhn", self.wv, fs)   # [Eh, nv, H, n]
        total = jnp.sum(tot, axis=1, keepdims=True)      # [Eh, 1, H, n]
        out = jnp.broadcast_to(total[:, :, None],
                               self.to_stack(f).shape)
        return self.from_stack(out)

    # --- column broadcasts --------------------------------------------------
    def broadcast_top(self, x):
        """Value at the column top node copied to every node (reference
        'project wz0 down the stack', hydrostatic_boussinesq_model.jl:700)."""
        xs = self.to_stack(x)
        top = xs[:, -1:, -1:, :, :]
        out = jnp.broadcast_to(top, xs.shape)
        return self.from_stack(out)

    def broadcast_bottom(self, x):
        xs = self.to_stack(x)
        bot = xs[:, :1, :1, :, :]
        out = jnp.broadcast_to(bot, xs.shape)
        return self.from_stack(out)
