"""Iterative solver tests (reference test/Numerics/SystemSolvers)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.solvers.iterative import (ColumnwiseLUPreconditioner,
                                                  batched_gmres,
                                                  conjugate_gradient, gmres,
                                                  newton_krylov)


def test_gmres_dense_system():
    rng = np.random.RandomState(0)
    n = 30
    A = np.eye(n) + 0.1 * rng.randn(n, n)
    b = rng.randn(n)
    x, res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                   n_krylov=n)
    assert float(res) < 1e-8
    assert np.allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-6)


def test_gmres_restarted():
    rng = np.random.RandomState(1)
    n = 40
    A = np.eye(n) + 0.3 * rng.randn(n, n) / np.sqrt(n)
    b = rng.randn(n)
    x, res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b),
                   n_krylov=15, restarts=4)
    assert float(res) < 1e-6


def test_batched_gmres_many_systems():
    rng = np.random.RandomState(2)
    B, n = 16, 12
    As = np.stack([np.eye(n) + 0.2 * rng.randn(n, n) for _ in range(B)])
    bs = rng.randn(B, n)
    Asj = jnp.asarray(As)

    # op maps [B, n] -> [B, n] with per-row matrices; vmapped solver slices
    # row 0 of its singleton batch
    import functools
    def single_solve(Ai, bi):
        x, r = gmres(lambda v: Ai @ v, bi, n_krylov=n)
        return x, r
    xs, res = jax.vmap(single_solve)(Asj, jnp.asarray(bs))
    assert float(jnp.max(res)) < 1e-7
    expected = np.stack([np.linalg.solve(As[i], bs[i]) for i in range(B)])
    assert np.allclose(np.asarray(xs), expected, atol=1e-5)


def test_conjugate_gradient_spd():
    rng = np.random.RandomState(3)
    n = 25
    Q = rng.randn(n, n)
    A = Q @ Q.T + n * np.eye(n)
    b = rng.randn(n)
    x, res = conjugate_gradient(lambda v: jnp.asarray(A) @ v,
                                jnp.asarray(b), n_iter=n)
    assert float(res) < 1e-7


def test_newton_krylov_nonlinear():
    """Solve x^3 + x - b = 0 componentwise."""
    b = jnp.asarray(np.linspace(-2, 2, 10))

    def F(x):
        return x ** 3 + x - b

    x, res = newton_krylov(F, jnp.zeros_like(b), n_newton=8, n_krylov=10)
    assert float(res) < 1e-9
    assert float(jnp.max(jnp.abs(x ** 3 + x - b))) < 1e-9


def test_gmres_with_columnwise_preconditioner():
    """GMRES on the HEVI backward-Euler system, preconditioned by the
    columnwise dense inverse: converges in very few iterations."""
    from climatemachine_tpu.atmos.linear import AtmosAcousticGravityLinearModel
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state, VERTICAL
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.solvers.columnwise import (ColumnLayout,
                                                       ManyColumnSolver)

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64, hyperdiffusion_tau=None)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    lin = AtmosAcousticGravityLinearModel(cfg.model)
    dg_lin = DGModel(lin, cfg.grid, direction=VERTICAL, update_aux=False)
    lay = ColumnLayout(cfg.grid, cfg.model.prog_spec.num)
    op_l = lambda x: dg_lin(x, aux, 0.0)[0]
    col = ManyColumnSolver(op_l, lay, q)
    alpha = 20.0

    def be_op(x):
        return x - alpha * op_l(x)

    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.randn(*q.shape))
    pre = ColumnwiseLUPreconditioner(col, alpha)
    x, res = gmres(lambda v: be_op(v.reshape(q.shape)).reshape(-1),
                   b.reshape(-1), n_krylov=3,
                   precond=lambda v: pre(v).reshape(-1))
    # exact-inverse preconditioner: solved in a couple of iterations
    assert float(res) / float(jnp.linalg.norm(b)) < 1e-10


def test_gcr_matches_direct_solve():
    """GCR on a nonsymmetric system (reference
    generalized_conjugate_residual_solver.jl)."""
    from climatemachine_tpu.solvers.iterative import (
        generalized_conjugate_residual)
    rng = np.random.default_rng(3)
    A = np.eye(40) + 0.25 * rng.standard_normal((40, 40))
    b = rng.standard_normal(40)
    x, r = generalized_conjugate_residual(
        lambda v: jnp.asarray(A) @ v, jnp.asarray(b), n_krylov=40)
    assert float(r) < 1e-10
    assert np.allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-9)


def test_batched_gmres_batch_dependent_operator():
    """Regression: op carries PER-BATCH coefficients — each system must
    be solved with its own matrix (a vmap-of-closure implementation
    silently broadcast batch-0's operator to every row)."""
    rng = np.random.RandomState(7)
    B, n = 8, 10
    As = np.stack([np.eye(n) + 0.15 * rng.randn(n, n) for _ in range(B)])
    bs = rng.randn(B, n)
    Asj = jnp.asarray(As)

    def op(xb):                       # [B, n] -> [B, n], full batch
        return jnp.einsum("bij,bj->bi", Asj, xb)

    xs, res = batched_gmres(op, jnp.asarray(bs), n_krylov=n, restarts=2)
    assert float(jnp.max(res)) < 1e-8, np.asarray(res)
    expected = np.stack([np.linalg.solve(As[i], bs[i]) for i in range(B)])
    assert np.allclose(np.asarray(xs), expected, atol=1e-6)
