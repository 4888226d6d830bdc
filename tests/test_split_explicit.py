"""Split-explicit ocean coupling test: hydrostatic spindown vs analytic
(reference test/Ocean/SplitExplicit/test_spindown_short.jl + refvals)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.ocean.problems import (Fixed, SimpleBox,
                                               ocean_box_grid)
from climatemachine_tpu.ocean.shallow_water import ConstantViscosity
from climatemachine_tpu.ocean.split_explicit import (BarotropicModel,
                                                     CoupledHBModel,
                                                     SplitExplicitSolver)
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.ode.lsrk3n import LS3NRK33Heuns


def test_split_explicit_spindown():
    Lx = Ly = 1e6
    H = 400.0
    nu_h = 1e4
    problem = SimpleBox(Lx, Ly, H, rotation=Fixed())
    c = float(np.sqrt(9.81 * H))

    # 3-D baroclinic model + grid
    # linear dynamics: the analytic spindown solves the linearized system
    m3 = CoupledHBModel(problem, nu_h=nu_h, nu_z=1e-3, kappa_h=0.0,
                        kappa_z=0.0, c_h=0.0, momentum_advection=None,
                        tracer_advection=None, apply_vert_filters=False)
    grid3 = ocean_box_grid(problem, 5, 2, 3, 3, dtype=np.float64)

    # 2-D barotropic model + grid (same horizontal mesh)
    m2 = BarotropicModel(problem, turbulence=ConstantViscosity(nu_h),
                         advection=None, c=c)
    r2 = [np.linspace(0, Lx, 6), np.linspace(0, Ly, 3)]
    topo2 = brick_topology(r2, periodicity=(False, False),
                           boundary=np.array([[1, 1], [1, 1]]))
    grid2 = make_grid(topo2, 3, dtype=np.float64)
    problem.init_state = problem.sw_init_state

    dg3 = DGModel(m3, grid3)
    dg2 = DGModel(m2, grid2)

    # initial states at t=0
    q2_0, aux2 = init_ode_state(dg2)
    problem.init_state = SimpleBox.init_state.__get__(problem)
    q3_0, aux3 = init_ode_state(dg3)

    fast_dt = 0.25 * min_node_distance(grid2) / c
    slow_dt = 10 * fast_dt
    slow = LSRK54CarpenterKennedy(lambda a, b, t: dg3(a, b, t), slow_dt)
    fast = LS3NRK33Heuns(lambda a, b, t: dg2(a, b, t), fast_dt)
    se = SplitExplicitSolver(slow, fast, dg3, dg2, dt=slow_dt,
                             fast_dt=fast_dt)

    step = jax.jit(se.step)
    q, aux = (q3_0, q2_0), (aux3, aux2)
    t = 0.0
    nsteps = 30
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += slow_dt
    q3, q2 = q
    assert bool(jnp.all(jnp.isfinite(q3)))
    assert bool(jnp.all(jnp.isfinite(q2)))

    # barotropic part matches the analytic decaying standing wave
    q2_exact = problem.sw_init_state(m2, grid2.coords, aux[1], t)
    for name in ["eta", "U"]:
        err = m2.prog(q2, name) - m2.prog(q2_exact, name)
        scale = float(jnp.max(jnp.abs(m2.prog(q2_exact, name)))) + 1e-30
        rel = float(jnp.max(jnp.abs(err))) / scale
        assert rel < 0.05, (name, rel)

    # 3-D state vs a monolithic (uncoupled, fully explicit) reference run
    # with identical BCs/filters — isolates the coupling machinery (the
    # analytic mode violates the zero-stress wall BC, so walls differ from
    # the closed form; the reference validates the same way via refvals)
    from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
        HydrostaticBoussinesqModel)
    m3u = HydrostaticBoussinesqModel(
        problem, nu_h=nu_h, nu_z=1e-3, kappa_h=0.0, kappa_z=0.0,
        c_h=c, momentum_advection=None, tracer_advection=None,
        apply_vert_filters=False)
    dg3u = DGModel(m3u, grid3)
    qU, auxU = init_ode_state(dg3u)
    nfast = int(round(t / fast_dt))
    mono = LSRK54CarpenterKennedy(lambda a, b, tt: dg3u(a, b, tt), fast_dt)
    mstep = jax.jit(mono.step)
    tm = 0.0
    for _ in range(nfast):
        qU, auxU = mstep(qU, auxU, tm)
        tm += fast_dt

    # interior comparison: the wall stress BC acts on the deviation in the
    # coupled split (reference Coupled velocity_gradient_flux!) but on the
    # total velocity in the monolithic model, so wall elements differ by
    # formulation (the reference likewise validates split-vs-split refvals)
    x3 = grid3.coords[..., 0]
    interior = (x3 > 0.25 * Lx) & (x3 < 0.75 * Lx)
    for name, tol in [("u", 0.05), ("eta", 0.08)]:
        err = m3.prog(q3, name) - m3u.prog(qU, name)
        mask = interior if err.ndim == x3.ndim else interior[..., None]
        err = jnp.where(mask, err, 0.0)
        scale = float(jnp.max(jnp.abs(m3u.prog(qU, name)))) + 1e-30
        rel = float(jnp.max(jnp.abs(err))) / scale
        assert rel < tol, (name, rel)
