"""Iterative linear & nonlinear solvers (matrix-free).

Scope of reference ``src/Numerics/SystemSolvers/``: SystemSolvers.jl
(:41-49 abstract types, linearsolve!), GMRES
(generalized_minimal_residual_solver.jl), BatchedGMRES
(batched_generalized_minimal_residual_solver.jl — many independent
per-column solves batched on device), CG
(conjugate_gradient_solver.jl), JFNK
(jacobian_free_newton_krylov_solver.jl), preconditioners.jl.

TPU-first: solvers are written for ONE system as pure functions with
static iteration counts (lax.fori-style unrolled loops), then **batched
with jax.vmap** — the reference's hand-written batched-GMRES kernels
(:500-:535) become a one-line transform.  Early exit is traded for fixed
iteration counts (XLA-friendly); callers pick counts from spectral
bounds, and residuals are returned for verification.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def gmres(op: Callable, b, x0=None, n_krylov: int = 20, restarts: int = 1,
          precond: Optional[Callable] = None):
    """Restarted GMRES for op(x) = b on flat arrays.

    Returns (x, residual_norm).  ``precond``: right preconditioner
    M⁻¹ (op(M⁻¹ y) = b solved for y = M x).
    """
    b = b.reshape(-1)
    n = b.shape[0]
    M = precond or (lambda v: v)

    def A(v):
        return op(M(v).reshape(b.shape)).reshape(-1)

    x = jnp.zeros_like(b) if x0 is None else x0.reshape(-1)

    def cycle(x):
        r = b - A(x)
        beta = jnp.linalg.norm(r)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        V = jnp.zeros((n_krylov + 1, n), dtype=b.dtype)
        V = V.at[0].set(r / safe_beta)
        H = jnp.zeros((n_krylov + 1, n_krylov), dtype=b.dtype)
        for j in range(n_krylov):
            w = A(V[j])
            # modified Gram-Schmidt
            for i in range(j + 1):
                hij = jnp.dot(V[i], w)
                H = H.at[i, j].set(hij)
                w = w - hij * V[i]
            hn = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hn)
            V = V.at[j + 1].set(w / jnp.where(hn == 0, 1.0, hn))
        # least squares min ||beta e1 - H y||
        e1 = jnp.zeros((n_krylov + 1,), dtype=b.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        return x + V[:n_krylov].T @ y

    for _ in range(restarts):
        x = cycle(x)
    resid = jnp.linalg.norm(b - A(x))
    return M(x), resid


def batched_gmres(op: Callable, b, n_krylov: int = 20, restarts: int = 1,
                  precond: Optional[Callable] = None):
    """Batched GMRES: op maps [B, n] -> [B, n] applying each system to
    its own row (reference BatchedGeneralizedMinimalResidual,
    :37-:535).  The Arnoldi process carries the batch axis natively —
    one fused device iteration advances every system, exactly the
    reference's batched kernels (:500 batched_initialize!, :535
    batched_arnoldi_process!).  (A vmap around a closure would silently
    broadcast per-batch operator coefficients across the batch — op
    must see the FULL batch.)

    Returns (x [B, n], residual_norm [B])."""
    B, n = b.shape
    M = precond or (lambda v: v)

    def A(V):                      # [B, n] -> [B, n]
        return op(M(V))

    x = jnp.zeros_like(b)

    def cycle(x):
        r = b - A(x)
        beta = jnp.linalg.norm(r, axis=1)                  # [B]
        safe = jnp.where(beta == 0, 1.0, beta)
        V = jnp.zeros((n_krylov + 1, B, n), dtype=b.dtype)
        V = V.at[0].set(r / safe[:, None])
        H = jnp.zeros((B, n_krylov + 1, n_krylov), dtype=b.dtype)

        def arnoldi(j, carry):
            V, H = carry
            w = A(V[j])                                    # [B, n]
            h = jnp.einsum("kbn,bn->bk", V, w)             # [B, k+1]
            mask = (jnp.arange(n_krylov + 1) <= j)
            h = jnp.where(mask[None, :], h, 0.0)
            w = w - jnp.einsum("bk,kbn->bn", h, V)
            hn = jnp.linalg.norm(w, axis=1)                # [B]
            safe_hn = jnp.where(hn == 0, 1.0, hn)
            V = V.at[j + 1].set(w / safe_hn[:, None])
            H = H.at[:, :, j].set(h.at[:, j + 1].set(hn)[:, :n_krylov + 1])
            return V, H

        V, H = jax.lax.fori_loop(0, n_krylov, arnoldi, (V, H))
        # per-batch least squares min ||beta e1 - H y||
        e1 = jnp.zeros((B, n_krylov + 1), dtype=b.dtype).at[:, 0].set(beta)
        y = jax.vmap(lambda Hi, gi: jnp.linalg.lstsq(Hi, gi)[0])(H, e1)
        return x + jnp.einsum("bk,kbn->bn", y, V[:n_krylov])

    for _ in range(restarts):
        x = cycle(x)
    x = M(x)
    return x, jnp.linalg.norm(op(x) - b, axis=1)


def conjugate_gradient(op: Callable, b, x0=None, n_iter: int = 50):
    """CG for SPD op (reference conjugate_gradient_solver.jl)."""
    b = b.reshape(-1)
    x = jnp.zeros_like(b) if x0 is None else x0.reshape(-1)
    r = b - op(x.reshape(b.shape)).reshape(-1)
    p = r
    rs = jnp.dot(r, r)
    for _ in range(n_iter):
        Ap = op(p.reshape(b.shape)).reshape(-1)
        denom = jnp.dot(p, Ap)
        alpha = rs / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.dot(r, r)
        beta = rs_new / jnp.where(rs == 0, 1.0, rs)
        p = r + beta * p
        rs = rs_new
    resid = jnp.linalg.norm(b - op(x.reshape(b.shape)).reshape(-1))
    return x, resid


def newton_krylov(F: Callable, x0, n_newton: int = 5, n_krylov: int = 20,
                  fd_eps: float = 1e-7):
    """Jacobian-free Newton-Krylov: solve F(x) = 0 (reference
    jacobian_free_newton_krylov_solver.jl): J·v ≈ (F(x+εv)−F(x))/ε."""
    x = x0.reshape(-1)
    shape = x0.shape

    for _ in range(n_newton):
        fx = F(x.reshape(shape)).reshape(-1)
        scale = jnp.linalg.norm(x) + 1.0

        def jv(v):
            eps = fd_eps * scale / jnp.maximum(jnp.linalg.norm(v), 1e-30)
            return ((F((x + eps * v).reshape(shape)).reshape(-1) - fx)
                    / eps)

        dx, _ = gmres(lambda v: jv(v.reshape(-1)), -fx, n_krylov=n_krylov)
        x = x + dx.reshape(-1)
    resid = jnp.linalg.norm(F(x.reshape(shape)))
    return x.reshape(shape), resid


# --- preconditioners ---------------------------------------------------------

class NoPreconditioner:
    def __call__(self, v):
        return v


class ColumnwiseLUPreconditioner:
    """Vertical-operator dense-inverse preconditioner (reference
    preconditioners.jl ColumnwiseLUPreconditioner) built on
    solvers.columnwise.ManyColumnSolver."""

    def __init__(self, col_solver, alpha_dt: float):
        self.col = col_solver
        self.alpha_dt = float(alpha_dt)

    def __call__(self, v):
        shaped = v.reshape(self.col.layout.n_horz * self.col.layout.n_vert,
                           self.col.layout.Np, self.col.layout.nvars)
        return self.col.solve(shaped, self.alpha_dt).reshape(v.shape)


def generalized_conjugate_residual(op: Callable, b, x0=None,
                                   n_krylov: int = 20, restarts: int = 1):
    """Restarted GCR(k) for general (nonsymmetric) op(x) = b (reference
    generalized_conjugate_residual_solver.jl).  Minimizes ‖b − Ax‖₂ over
    the Krylov space with explicitly A-orthogonalized search directions;
    static iteration counts (no data-dependent exits).  Returns
    (x, residual_norm)."""
    b = b.reshape(-1)

    def A(v):
        return op(v.reshape(b.shape)).reshape(-1)

    def cycle(x):
        r = b - A(x)
        ps, Aps = [], []
        for k in range(n_krylov):
            p = r
            Ap = A(p)
            # A-orthogonalize against previous directions
            for pj, Apj in zip(ps, Aps):
                beta = jnp.vdot(Apj, Ap) / jnp.vdot(Apj, Apj)
                p = p - beta * pj
                Ap = Ap - beta * Apj
            denom = jnp.vdot(Ap, Ap)
            alpha = jnp.where(jnp.abs(denom) > 1e-300,
                              jnp.vdot(Ap, r) / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            ps.append(p)
            Aps.append(Ap)
        return x, r

    x = jnp.zeros_like(b) if x0 is None else x0.reshape(-1)
    for _ in range(restarts):
        x, r = cycle(x)
    return x.reshape(b.shape), jnp.linalg.norm(r)
