"""IMEX (HEVI) tests: columnwise operator assembly, backward-Euler solve,
and ARK2 stepping vs explicit reference (reference
test/Numerics/DGMethods/Euler/acousticwave_1d_imex.jl and
test/Numerics/SystemSolvers columnwise LU tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos.linear import AtmosAcousticGravityLinearModel
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state, VERTICAL
from climatemachine_tpu.driver.solver_types import IMEXSolverType
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.ode.solve import (from_internal,
                                           to_internal)
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.solvers.columnwise import (BlockTridiagColumnSolver,
                                                   ColumnLayout,
                                                   ManyColumnSolver)


def _setup(n_horz=2, n_vert=3, poly=3):
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=poly,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    return cfg, dg, q, aux


def test_columnwise_assembly_matches_operator():
    cfg, dg, q, aux = _setup()
    lin = AtmosAcousticGravityLinearModel(cfg.model)
    dg_lin = DGModel(lin, cfg.grid, direction=VERTICAL, update_aux=False)
    lay = ColumnLayout(cfg.grid, cfg.model.prog_spec.num)
    op = lambda x: dg_lin(x, aux, 0.0)[0]
    sol = ManyColumnSolver(op, lay, q)
    assert float(jnp.max(jnp.abs(sol.b_cols))) == 0.0

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*q.shape))
    Lx = lay.to_columns(op(x))
    Ax = jnp.einsum("cij,cj->ci", sol.A, lay.to_columns(x))
    scale = float(jnp.max(jnp.abs(Lx)))
    assert float(jnp.max(jnp.abs(Lx - Ax))) < 1e-11 * scale

    # backward-Euler residual: (I - a L) solve(rhs) == rhs
    alpha = 0.7
    y = sol.solve(x, alpha)
    resid = y - alpha * op(y) - x
    assert float(jnp.max(jnp.abs(resid))) < 1e-9 * float(jnp.max(jnp.abs(x)))


def test_block_tridiag_matches_dense_oracle():
    """BlockTridiagColumnSolver (O(ncol·Nv·bw) memory, reference
    ManyColumnLU scaling) reproduces the dense basis-probed inverse."""
    cfg, dg, q, aux = _setup(n_horz=2, n_vert=4, poly=3)
    lin = AtmosAcousticGravityLinearModel(cfg.model)
    dg_lin = DGModel(lin, cfg.grid, direction=VERTICAL, update_aux=False)
    lay = ColumnLayout(cfg.grid, cfg.model.prog_spec.num)
    op = lambda x: dg_lin(x, aux, 0.0)[0]
    dense = ManyColumnSolver(op, lay, q)
    banded = BlockTridiagColumnSolver(op, lay, q)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*q.shape))
    # matvec parity: the extracted block-tridiagonal IS the operator
    Ax_d = jnp.einsum("cij,cj->ci", dense.A, lay.to_columns(x))
    Ax_b = banded._matvec(lay.to_columns(x))
    scale = float(jnp.max(jnp.abs(Ax_d)))
    assert float(jnp.max(jnp.abs(Ax_b - Ax_d))) < 1e-11 * scale

    # solve parity at several shifts + backward-Euler residual
    for alpha in (0.3, 2.0, 25.0):
        y_d = dense.solve(x, alpha)
        y_b = banded.solve(x, alpha)
        s = float(jnp.max(jnp.abs(y_d)))
        assert float(jnp.max(jnp.abs(y_b - y_d))) < 1e-9 * s, alpha
        resid = y_b - alpha * op(y_b) - x
        assert float(jnp.max(jnp.abs(resid))) < 1e-9 * float(
            jnp.max(jnp.abs(x))), alpha


def test_block_tridiag_rejects_wide_stencil():
    """The setup matvec check catches operators coupling beyond adjacent
    vertical elements (would silently alias under comb probing)."""
    import pytest
    cfg, dg, q, aux = _setup(n_horz=2, n_vert=4, poly=3)
    lay = ColumnLayout(cfg.grid, cfg.model.prog_spec.num)

    def wide(x):
        # synthetic linear op coupling element ev to ev-2
        xb = lay.to_columns(x).reshape(lay.ncol, lay.n_vert, -1)
        yb = jnp.roll(xb, 2, axis=1)
        return lay.from_columns(yb.reshape(lay.ncol, lay.Nv))

    with pytest.raises(ValueError, match="beyond adjacent"):
        BlockTridiagColumnSolver(wide, lay, q)


def test_imex_matches_explicit():
    """ARK2 IMEX at 8x the explicit dt tracks the LSRK54 solution."""
    cfg, dg, q0, aux0 = _setup(n_horz=2, n_vert=3, poly=4)
    dt_exp = 0.2 * min_node_distance(cfg.grid) / 350.0
    nsteps_exp = 64
    t_end = nsteps_exp * dt_exp

    ex = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt_exp)
    step = jax.jit(ex.step)
    q_ref, aux = q0, aux0
    t = 0.0
    for _ in range(nsteps_exp):
        q_ref, aux = step(q_ref, aux, t)
        t += dt_exp

    imex = IMEXSolverType().make(dg, q0, aux0, 8 * dt_exp)
    stepi = jax.jit(imex.step)
    q_im, aux = to_internal(imex, q0, aux0)
    t = 0.0
    for _ in range(nsteps_exp // 8):
        q_im, aux = stepi(q_im, aux, t)
        t += 8 * dt_exp
    q_im, aux = from_internal(imex, q_im, aux)

    assert bool(jnp.all(jnp.isfinite(q_im)))
    # per-variable agreement relative to the dynamic range of the change
    for name in ["rho", "rhou", "rhoe"]:
        d_ref = cfg.model.prog(q_ref, name) - cfg.model.prog(q0, name)
        err = cfg.model.prog(q_im, name) - cfg.model.prog(q_ref, name)
        scale = float(jnp.max(jnp.abs(d_ref))) + 1e-14
        assert float(jnp.max(jnp.abs(err))) < 0.25 * scale, name


def test_imex_stable_at_large_dt():
    """IMEX remains stable at 20x the vertical-acoustic explicit limit."""
    cfg, dg, q0, aux0 = _setup(n_horz=4, n_vert=3, poly=4)
    dt_exp = 0.3 * min_node_distance(cfg.grid) / 350.0
    imex = IMEXSolverType().make(dg, q0, aux0, 20 * dt_exp)
    stepi = jax.jit(imex.step)
    q, aux = to_internal(imex, q0, aux0)
    t = 0.0
    for _ in range(10):
        q, aux = stepi(q, aux, t)
        t += imex.dt
    q, aux = from_internal(imex, q, aux)
    assert bool(jnp.all(jnp.isfinite(q)))
    u = cfg.model.prog(q, "rhou") / cfg.model.prog(q, "rho")[..., None]
    assert float(jnp.max(jnp.abs(u))) < 100.0


def test_remainder_dgmodel_exact():
    """Fused remainder RHS (reference remainder.jl RemBL) equals the
    two-call difference full(q) - linear_vertical(q) to round-off."""
    from climatemachine_tpu.atmos.linear import (
        AtmosAcousticGravityLinearModel)
    from climatemachine_tpu.dg.spatial import (DGModel, VERTICAL,
                                               remainder_DGModel)
    cfg, dg, q0, aux0 = _setup(n_horz=3, n_vert=3, poly=4)
    lin = AtmosAcousticGravityLinearModel(cfg.model)
    dg_lin = DGModel(lin, cfg.grid, numerical_flux_first_order=dg.nf1,
                     direction=VERTICAL, update_aux=False)
    dg_rem = remainder_DGModel(dg, dg_lin)

    t_full, aux1 = dg(q0, aux0, 0.0)
    t_lin, _ = dg_lin(q0, aux1, 0.0)
    t_rem, _ = dg_rem(q0, aux0, 0.0)
    ref = t_full - t_lin
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    err = float(jnp.max(jnp.abs(t_rem - ref)))
    assert err < 1e-10 * scale


def test_ark_tableau_order():
    """Scalar IMEX convergence orders of the full tableau family
    (reference test/Numerics/ODESolvers/ode_tests_basic.jl)."""
    import numpy as np
    from climatemachine_tpu.ode.ark import (
        ARK2GiraldoKellyConstantinescu, ARK437L2SA1KennedyCarpenter,
        ARK548L2SA2KennedyCarpenter, DBM453VoglEtAl)

    lam_ex, lam_im = -0.6, -3.0
    exact = np.exp(lam_ex + lam_im)

    class _Solver:
        def solve(self, rhs, alpha_dt):
            return rhs / (1.0 - alpha_dt * lam_im)

    def run(ctor, n):
        sol = ctor(lambda q, a, t: (lam_ex * q, a),
                   lambda q, a, t: (lam_im * q, a), _Solver(), 1.0 / n)
        q, aux, t = jnp.asarray([1.0]), None, 0.0
        for _ in range(n):
            q, aux = sol.step(q, aux, t)
            t += 1.0 / n
        return abs(float(q[0]) - exact)

    for ctor, order in [(ARK2GiraldoKellyConstantinescu, 2),
                        (DBM453VoglEtAl, 3),
                        (ARK437L2SA1KennedyCarpenter, 4),
                        (ARK548L2SA2KennedyCarpenter, 5)]:
        e1, e2 = run(ctor, 8), run(ctor, 16)
        p = np.log2(e1 / e2)
        assert p > order - 0.6, (ctor.__name__, p, e1, e2)


def test_multirate_and_mis_solver_types():
    """Multirate/MIS strategy objects assemble stable slow-fast solvers
    on the full atmosphere (reference MultirateSolverType.jl:59 /
    MISSolverType.jl:48 SlowFastSplitting)."""
    from climatemachine_tpu.driver.solver_types import (MISSolverType,
                                                        MultirateSolverType)

    cfg, dg, q0, aux0 = _setup(n_horz=2, n_vert=3, poly=3)
    dt_exp = 0.3 * min_node_distance(cfg.grid) / 350.0

    for st in (MultirateSolverType(timestep_ratio=4),
               MISSolverType(nsubsteps=4)):
        lin = st.getdtmodel(cfg.model)
        assert lin is not cfg.model
        sol = st.make(dg, q0, aux0, 4 * dt_exp)
        step = jax.jit(sol.step)
        q, aux, t = q0, aux0, 0.0
        for _ in range(6):
            q, aux = step(q, aux, t)
            t += sol.dt
        assert bool(jnp.all(jnp.isfinite(q))), type(st).__name__
        u = cfg.model.prog(q, "rhou") / cfg.model.prog(q, "rho")[..., None]
        assert float(jnp.max(jnp.abs(u))) < 100.0, type(st).__name__
