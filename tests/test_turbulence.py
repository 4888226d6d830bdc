"""Turbulence closure tests: viscous momentum diffusion against the
analytic heat-equation decay rate (reference-style MMS check,
test/Numerics/DGMethods/advection_diffusion) and SGS closure smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.atmos import AtmosModel, AtmosPhysics
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.common.turbulence import (ConstantKinematicViscosity,
                                                  SmagorinskyLilly)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH


def _shear_model(nu, L=1000.0, n=4, poly=4, turbulence=None):
    """Periodic isothermal box, no gravity, sinusoidal shear u_x(z)."""
    ps = EARTH
    r = [np.linspace(0, L, n + 1)] * 3
    topo = brick_topology(r, periodicity=(True, True, True))
    grid = make_grid(topo, poly, dtype=np.float64)
    from climatemachine_tpu.common.orientations import NoOrientation
    physics = AtmosPhysics(
        orientation=NoOrientation(),
        turbulence=turbulence or ConstantKinematicViscosity(nu))

    T0, u0 = 300.0, 1.0
    k = 2 * np.pi / L

    def init(m, coords, aux, t):
        z = coords[..., 2]
        rho = jnp.full_like(z, 1.0)
        u = u0 * jnp.sin(k * z)
        rhou = jnp.stack([rho * u, jnp.zeros_like(u), jnp.zeros_like(u)],
                         axis=-1)
        e_int = td.internal_energy(ps, jnp.full_like(z, T0))
        ke = 0.5 * u ** 2
        q = m.prog_spec.pack({"rho": rho, "rhoe": rho * (e_int + ke)},
                             batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    problem = AtmosProblem(init_state=init,
                           boundary_conditions=(AtmosBC(), AtmosBC()))
    model = AtmosModel(physics, problem, sources=())
    return model, grid, k


def test_constant_viscosity_shear_decay():
    nu = 30.0
    model, grid, k = _shear_model(nu)
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    nsteps = 200
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    # amplitude of u_x decays like exp(-nu k^2 t)
    u0x = model.prog(q0, "rhou")[..., 0] / model.prog(q0, "rho")
    ux = model.prog(q, "rhou")[..., 0] / model.prog(q, "rho")
    a0 = float(jnp.max(jnp.abs(u0x)))
    a1 = float(jnp.max(jnp.abs(ux)))
    expected = a0 * np.exp(-nu * k ** 2 * t)
    assert abs(a1 - expected) / a0 < 2e-3
    assert bool(jnp.all(jnp.isfinite(q)))


def test_smagorinsky_runs_and_dissipates():
    model, grid, k = _shear_model(0.0, turbulence=SmagorinskyLilly(0.21))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    # aux has the SGS lengthscale filled
    delta = model.aux_get(aux, "turbulence.delta")
    assert float(jnp.min(delta)) > 0.0
    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))

    def ke(qq):
        rho = model.prog(qq, "rho")
        rhou = model.prog(qq, "rhou")
        M = grid.M
        return float(jnp.sum(M * 0.5 * jnp.sum(rhou ** 2, -1) / rho))

    assert ke(q) < ke(q0)


def test_anisomindiss_runs_and_dissipates():
    """AnisoMinDiss closure (reference TurbulenceClosures.jl:618) on the
    shear box: positive eddy viscosity, KE decays, state stays finite."""
    from climatemachine_tpu.common.turbulence import AnisoMinDiss
    model, grid, k = _shear_model(0.0, turbulence=AnisoMinDiss())
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(50):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))

    def ke(qq):
        rho = model.prog(qq, "rho")
        rhou = model.prog(qq, "rhou")
        return float(jnp.sum(grid.M * 0.5 * jnp.sum(rhou ** 2, -1) / rho))

    assert ke(q) < ke(q0)


def test_deardorff_sgstke():
    """Deardorff TKE closure + prognostic SGS TKE (reference sgstke.jl +
    TurbulenceClosures.jl:700): shear production feeds e_SGS, resolved KE
    decays, TKE stays bounded and finite."""
    from climatemachine_tpu.atmos.sgstke import SGStkeModel
    from climatemachine_tpu.common.orientations import NoOrientation
    from climatemachine_tpu.common.turbulence import Deardorff
    ps = EARTH
    L = 1000.0
    r = [np.linspace(0, L, 4)] * 3
    topo = brick_topology(r, periodicity=(True, True, True))
    grid = make_grid(topo, 4, dtype=np.float64)
    physics = AtmosPhysics(orientation=NoOrientation(),
                           turbulence=Deardorff(),
                           sgstke=SGStkeModel())
    T0, u0, e0 = 300.0, 1.0, 0.1
    kz = 2 * np.pi / L

    def init(m, coords, aux, t):
        z = coords[..., 2]
        rho = jnp.full_like(z, 1.0)
        u = u0 * jnp.sin(kz * z)
        rhou = jnp.stack([rho * u, jnp.zeros_like(u), jnp.zeros_like(u)],
                         axis=-1)
        e_int = td.internal_energy(ps, jnp.full_like(z, T0))
        q = m.prog_spec.pack(
            {"rho": rho, "rhoe": rho * (e_int + 0.5 * u ** 2),
             "sgstke.rhoe_SGS": rho * e0}, batch_shape=rho.shape)
        return m.prog_spec.set(q, "rhou", rhou)

    model = AtmosModel(physics,
                       AtmosProblem(init_state=init,
                                    boundary_conditions=(AtmosBC(),) * 2))
    dg = DGModel(model, grid)
    q0, aux = init_ode_state(dg)
    tend, _ = dg(q0, aux, 0.0)
    assert bool(jnp.all(jnp.isfinite(tend)))
    # with weak shear, dissipation (-rho C e^1.5/l) dominates production:
    # net TKE tendency is negative and of the analytic magnitude
    sl = model.prog_spec.index("sgstke.rhoe_SGS").start
    net = float(jnp.sum(grid.M * tend[..., sl]))
    vol = float(jnp.sum(grid.M))
    delta = float(jnp.max(model.aux_get(aux, "turbulence.delta")))
    diss_est = -0.7 * e0 ** 1.5 / delta * vol
    assert diss_est * 3 < net < 0.0, (net, diss_est)

    dt = 0.3 * min_node_distance(grid) / 360.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(60):
        q, aux = step(q, aux, t)
        t += dt
    assert bool(jnp.all(jnp.isfinite(q)))
    e_sgs = model.prog(q, "sgstke.rhoe_SGS") / model.prog(q, "rho")
    assert float(jnp.max(e_sgs)) < 10.0
    assert float(jnp.min(e_sgs)) > -0.05
