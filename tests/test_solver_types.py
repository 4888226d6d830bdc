"""Driver-level solver strategy objects (reference src/Driver/SolverTypes/):
HEVI, fully-implicit, and ocean split-explicit assemblies."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.driver.solver_types import (HEVISolverType,
                                                    ImplicitSolverType,
                                                    SplitExplicitSolverType)
from climatemachine_tpu.experiments.held_suarez import held_suarez_config
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def _setup(n_horz=2, n_vert=3, poly=3):
    cfg = held_suarez_config(n_horz=n_horz, n_vert=n_vert, poly_order=poly,
                             dtype=np.float64)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    return cfg, dg, q, aux


def test_hevi_solver_type_tracks_explicit():
    """HEVI (nonlinear vertical implicit via JFNK, reference
    HEVISolverType.jl:54) stays stable at 8x the vertical acoustic dt
    and tracks the explicit solution."""
    cfg, dg, q0, aux0 = _setup(n_horz=2, n_vert=3, poly=4)
    dt_exp = 0.2 * min_node_distance(cfg.grid) / 350.0
    nsteps_exp = 32

    ex = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt_exp)
    step = jax.jit(ex.step)
    q_ref, aux, t = q0, aux0, 0.0
    for _ in range(nsteps_exp):
        q_ref, aux = step(q_ref, aux, t)
        t += dt_exp

    st = HEVISolverType(nonlinear_max_iterations=3,
                        linear_max_subspace_size=12)
    assert st.getdtmodel(cfg.model) is cfg.model
    hevi = st.make(dg, q0, aux0, 8 * dt_exp)
    steph = jax.jit(hevi.step)
    q, aux, t = q0, aux0, 0.0
    for _ in range(nsteps_exp // 8):
        q, aux = steph(q, aux, t)
        t += 8 * dt_exp
    assert bool(jnp.all(jnp.isfinite(q)))
    for name in ["rho", "rhou", "rhoe"]:
        d_ref = cfg.model.prog(q_ref, name) - cfg.model.prog(q0, name)
        err = cfg.model.prog(q, name) - cfg.model.prog(q_ref, name)
        scale = float(jnp.max(jnp.abs(d_ref))) + 1e-14
        assert float(jnp.max(jnp.abs(err))) < 0.3 * scale, name


def test_implicit_solver_type_stable_beyond_explicit_limit():
    """Fully-implicit backward Euler (reference ImplicitSolverType.jl:17)
    remains stable at 20x the acoustic dt."""
    cfg, dg, q0, aux0 = _setup(n_horz=2, n_vert=3, poly=3)
    dt_exp = 0.3 * min_node_distance(cfg.grid) / 350.0
    st = ImplicitSolverType(n_newton=3, n_krylov=12)
    sol = st.make(dg, q0, aux0, 20 * dt_exp)
    step = jax.jit(sol.step)
    q, aux, t = q0, aux0, 0.0
    for _ in range(3):
        q, aux = step(q, aux, t)
        t += sol.dt
    assert bool(jnp.all(jnp.isfinite(q)))
    u = cfg.model.prog(q, "rhou") / cfg.model.prog(q, "rho")[..., None]
    assert float(jnp.max(jnp.abs(u))) < 100.0


def test_split_explicit_solver_type_assembles():
    """SplitExplicitSolverType (reference SplitExplicitSolverType.jl:18)
    assembles the ocean barotropic/baroclinic coupling and steps."""
    from climatemachine_tpu.mesh.grid import make_grid
    from climatemachine_tpu.mesh.topology import brick_topology
    from climatemachine_tpu.ocean.problems import (Fixed, SimpleBox,
                                                   ocean_box_grid)
    from climatemachine_tpu.ocean.shallow_water import ConstantViscosity
    from climatemachine_tpu.ocean.split_explicit import (BarotropicModel,
                                                         CoupledHBModel)

    Lx = Ly = 1e6
    H = 400.0
    problem = SimpleBox(Lx, Ly, H, rotation=Fixed())
    c = float(np.sqrt(9.81 * H))
    m3 = CoupledHBModel(problem, nu_h=1e4, nu_z=1e-3, kappa_h=0.0,
                        kappa_z=0.0, c_h=0.0, momentum_advection=None,
                        tracer_advection=None, apply_vert_filters=False)
    grid3 = ocean_box_grid(problem, 4, 2, 3, 3, dtype=np.float64)
    m2 = BarotropicModel(problem, turbulence=ConstantViscosity(1e4),
                         advection=None, c=c)
    r2 = [np.linspace(0, Lx, 5), np.linspace(0, Ly, 3)]
    topo2 = brick_topology(r2, periodicity=(False, False),
                           boundary=np.array([[1, 1], [1, 1]]))
    grid2 = make_grid(topo2, 3, dtype=np.float64)
    problem.init_state = problem.sw_init_state
    dg3, dg2 = DGModel(m3, grid3), DGModel(m2, grid2)
    q2_0, aux2 = init_ode_state(dg2)
    problem.init_state = SimpleBox.init_state.__get__(problem)
    q3_0, aux3 = init_ode_state(dg3)

    fast_dt = 0.25 * min_node_distance(grid2) / c
    st = SplitExplicitSolverType(dt_slow=10 * fast_dt, dt_fast=fast_dt)
    assert st.getdtmodel(m3) is m3
    se = st.make(dg3, dg2)
    step = jax.jit(se.step)
    q, aux, t = (q3_0, q2_0), (aux3, aux2), 0.0
    for _ in range(2):
        q, aux = step(q, aux, t)
        t += se.dt
    assert bool(jnp.all(jnp.isfinite(q[0])))
    assert bool(jnp.all(jnp.isfinite(q[1])))
