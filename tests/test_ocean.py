"""Ocean model tests: column integrals, shallow-water spindown vs the
analytic solution (reference test/Ocean/ShallowWater + SplitExplicit
spindown refvals), hydrostatic Boussinesq gyre stability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.dg.columns import ColumnOps
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import (brick_topology,
                                              stacked_brick_topology)
from climatemachine_tpu.ocean.hydrostatic_boussinesq import (
    HydrostaticBoussinesqModel)
from climatemachine_tpu.ocean.problems import (Fixed, OceanGyre, SimpleBox,
                                               ocean_box_grid)
from climatemachine_tpu.ocean.shallow_water import (ConstantViscosity,
                                                    ShallowWaterModel)
from climatemachine_tpu.ode.lsrk import (LSRK54CarpenterKennedy,
                                         LSRK144NiegemannDiehlBusch)


def test_column_integrals_analytic():
    """∫0^z (3z'^2) dz' = z^3 and the reverse integral on a stacked box."""
    r = [np.linspace(0, 1, 3)] * 2 + [np.linspace(0, 1, 5)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    cols = ColumnOps(grid)
    z = grid.coords[..., 2]
    f = (3 * z ** 2)[..., None]
    I = cols.indefinite_integral(f)[..., 0]
    assert float(jnp.max(jnp.abs(I - z ** 3))) < 1e-12
    R = cols.reverse_indefinite_integral(f)[..., 0]
    assert float(jnp.max(jnp.abs(R - (1 - z ** 3)))) < 1e-12
    top = cols.broadcast_top((z ** 2)[..., None])[..., 0]
    assert float(jnp.max(jnp.abs(top - 1.0))) < 1e-12


def test_shallow_water_spindown_matches_analytic():
    """Viscous standing-wave decay tracks the exact ODE solution
    (reference simple_box_problem.jl barotropic_state!)."""
    Lx = Ly = 1e6
    H = 1000.0
    problem = SimpleBox(Lx, Ly, H, rotation=Fixed())
    c = float(np.sqrt(9.81 * H))
    model = ShallowWaterModel(problem, turbulence=ConstantViscosity(1e4),
                              advection=None, c=c)
    # SimpleBox init for SW
    problem.init_state = problem.sw_init_state

    r = [np.linspace(0, Lx, 7), np.linspace(0, Ly, 3)]
    topo = brick_topology(r, periodicity=(False, False),
                          boundary=np.array([[1, 1], [1, 1]]))
    grid = make_grid(topo, 4, dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)

    dt = 0.25 * min_node_distance(grid) / c
    nsteps = 200
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt,
                                    pre_stage=dg.pre_stage)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt

    q_exact = problem.sw_init_state(model, grid.coords, aux, t)
    for name in ["eta", "U"]:
        err = model.prog(q, name) - model.prog(q_exact, name)
        scale = float(jnp.max(jnp.abs(model.prog(q_exact, name)))) + 1e-30
        assert float(jnp.max(jnp.abs(err))) < 0.02 * scale, name


def test_hb_gyre_runs_stably():
    """OceanGyre: wind stress + restoring; runs stably, θ stays bounded,
    w is divergence-consistent."""
    problem = OceanGyre(Lx=4e6, Ly=4e6, H=1000.0)
    model = HydrostaticBoussinesqModel(problem, c_h=np.sqrt(9.81 * 1000.0))
    grid = ocean_box_grid(problem, 3, 3, 3, 3, dtype=np.float64)
    dg = DGModel(model, grid)
    q0, aux0 = init_ode_state(dg)
    assert bool(jnp.all(jnp.isfinite(q0)))

    # gravity wave speed limits dt
    c = float(np.sqrt(9.81 * 1000.0))
    dt = 0.2 * min_node_distance(grid, "horizontal") / c
    solver = LSRK144NiegemannDiehlBusch(lambda a, b, t: dg(a, b, t), dt,
                                        pre_stage=dg.pre_stage)
    step = jax.jit(solver.step)
    q, aux, t = q0, aux0, 0.0
    for _ in range(20):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    theta = model.prog(q, "theta")
    assert float(jnp.min(theta)) > -1.0 and float(jnp.max(theta)) < 20.0
    # w at the bottom is ~0 (integral starts at bottom)
    w = model.aux_get(aux, "w")
    cols = ColumnOps(grid)
    wb = cols.to_stack(w[..., None])[:, 0, 0]
    assert float(jnp.max(jnp.abs(wb))) < 1e-10


def test_ivdc_implicit_convective_adjustment():
    """IVDC implicit vertical diffusion/convection (reference
    SplitExplicit01/IVDCModel.jl): backward-Euler solve L(theta)=theta_n/dt
    converges (residual check), conserves heat content, and mixes an
    unstable column with dt far beyond the explicit kappa_c limit."""
    from climatemachine_tpu.ocean.ivdc import ivdc_solve, ivdc_coefficients
    H, L = 100.0, 1000.0
    problem = OceanGyre(L, L, H)
    model = HydrostaticBoussinesqModel(problem, kappa_z=1e-4, kappa_c=1.0)
    grid = ocean_box_grid(problem, 2, 2, 5, 3, dtype=np.float64)
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    # unstable stratification: warm at bottom (dtheta/dz < 0)
    z = grid.coords[..., 2]           # in [-H, 0]
    theta0 = 10.0 - 2.0 * (z / H)     # increases downward -> unstable
    q = model.prog_spec.set(q, "theta", theta0)

    kap = ivdc_coefficients(model, dg, q, aux)
    assert float(jnp.median(kap)) == 1.0      # convective everywhere

    # dt >> explicit limit dz^2/kappa_c
    dz = float(min_node_distance(grid, direction="vertical"))
    dt = 200.0 * dz * dz / 1.0
    q1 = ivdc_solve(model, dg, q, aux, dt)
    th1 = model.prog(q1, "theta")

    # heat content conserved (insulating, conservative operator)
    M = grid.M
    h0 = float(jnp.sum(M * theta0))
    h1 = float(jnp.sum(M * th1))
    assert abs(h1 - h0) / abs(h0) < 1e-8
    # variance strongly reduced (column mixes toward uniform)
    v0 = float(jnp.sum(M * (theta0 - h0 / float(jnp.sum(M))) ** 2))
    v1 = float(jnp.sum(M * (th1 - h1 / float(jnp.sum(M))) ** 2))
    assert v1 < 0.2 * v0
    assert bool(jnp.all(jnp.isfinite(th1)))

    # stable profile with tiny dt: theta nearly unchanged
    theta_s = 10.0 + 2.0 * (z / H)
    qs = model.prog_spec.set(q, "theta", theta_s)
    kap_s = ivdc_coefficients(model, dg, qs, aux)
    assert float(jnp.median(kap_s)) == 0.5 * 1e-4
    q2 = ivdc_solve(model, dg, qs, aux, 1.0)
    assert float(jnp.max(jnp.abs(model.prog(q2, "theta") - theta_s))) < 1e-5


def test_super_model_geostrophic_adjustment():
    """HydrostaticBoussinesqSuperModel one-call API (reference
    SuperModels.jl + tutorials/Ocean/geostrophic_adjustment.jl): build
    from a RectangularDomain + InitialConditions, run, observe gravity
    waves radiating from a half-balanced Gaussian bump while volume
    (integral of eta) is conserved."""
    from climatemachine_tpu.ocean.super_model import (
        HydrostaticBoussinesqSuperModel, InitialConditions,
        RectangularDomain)
    Lx = 1e6
    f, g = 1e-4, 9.81
    U, Lg = 0.1, Lx / 40
    a = f * U * Lg / g
    x0 = Lx / 4

    gauss = lambda x: jnp.exp(-x ** 2 / (2 * Lg ** 2))
    vg = lambda x, y, z: -U * (x - x0) / Lg * gauss(x - x0)
    etai = lambda x, y, z: 2 * a * gauss(x - x0)

    domain = RectangularDomain(Ne=(20, 1, 1), Np=4, x=(0, Lx), y=(0, Lx),
                               z=(-400.0, 0.0),
                               periodicity=(False, True, False))
    model = HydrostaticBoussinesqSuperModel(
        domain, time_step=100.0,
        initial_conditions=InitialConditions(v=vg, eta=etai),
        coriolis=dict(f_0=f, beta=0.0),
        turbulence_closure=dict(nu_h=1e3, nu_z=1e-2, kappa_h=1e3,
                                kappa_z=1e-4),
        rusanov_wave_speeds=dict(c_h=float(np.sqrt(g * 400.0)), c_z=1e-3))

    eta0 = np.asarray(model.fields["eta"])
    M = np.asarray(model.grid.M)
    vol0 = float((M * eta0).sum())

    model.solve(until=3600.0)        # 1 hour: waves start radiating
    assert model.step_count == 36
    eta1 = np.asarray(model.fields["eta"])
    assert np.isfinite(eta1).all()
    vol1 = float((M * eta1).sum())
    assert abs(vol1 - vol0) <= 1e-10 * abs(M.sum() * a) + 1e-12
    # bump amplitude decreased as the unbalanced part radiates
    assert eta1.max() < 0.95 * eta0.max()
    # ... and the disturbance propagated beyond the initial bump region
    x = np.asarray(model.grid.coords[..., 0])
    far = np.abs(x - x0) > 4 * Lg
    assert np.abs(eta1[far]).max() > 10 * np.abs(eta0[far]).max()
