"""Isentropic vortex: exact solution of the dry Euler equations
(reference test/Numerics/DGMethods/Euler/isentropicvortex.jl + _setup.jl):
a Gaussian vortex advected by a uniform stream through a periodic box.
Verifies nonlinear-Euler spatial convergence and flux variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.atmos import AtmosModel, AtmosPhysics
from climatemachine_tpu.atmos.boundaryconditions import AtmosBC
from climatemachine_tpu.atmos.model import AtmosProblem
from climatemachine_tpu.atmos.numerical_fluxes import (HLLCNumericalFlux,
                                                       RoeNumericalFlux)
from climatemachine_tpu.common.orientations import NoOrientation
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.physics import thermodynamics as td
from climatemachine_tpu.physics.parameters import EARTH

PS = EARTH
P_INF = 1e5
T_INF = 300.0
RHO_INF = P_INF / (PS.R_d * T_INF)
U_T = 150.0                     # translation speed
ALPHA = np.pi / 4
U_V = 50.0                      # vortex speed
R_V = 1.0 / 200                 # vortex radius
L = 1.0 / 20                    # domain halflength


def vortex_state(model, coords, t):
    """Exact state at time t (reference isentropicvortex_setup.jl)."""
    u_inf = jnp.asarray([U_T * np.cos(ALPHA), U_T * np.sin(ALPHA), 0.0])
    x = coords - u_inf * t
    # periodic wrap into [-L, L)
    x = x - jnp.floor((x + L) / (2 * L)) * 2 * L
    r2 = x[..., 0] ** 2 + x[..., 1] ** 2
    gauss = jnp.exp(-r2 / R_V ** 2 / 2.0)
    du_x = -U_V * x[..., 1] / R_V * gauss
    du_y = U_V * x[..., 0] / R_V * gauss
    u = jnp.stack([u_inf[0] + du_x, u_inf[1] + du_y,
                   jnp.zeros_like(du_x)], axis=-1)
    T = T_INF * (1 - PS.kappa_d * U_V ** 2 / 2 * RHO_INF / P_INF
                 * jnp.exp(-r2 / R_V ** 2))
    p = P_INF * (T / T_INF) ** (1.0 / PS.kappa_d)
    rho = p / (PS.R_d * T)
    e_kin = 0.5 * jnp.sum(u * u, axis=-1)
    rhoe = rho * (td.internal_energy(PS, T) + e_kin)
    q = model.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
    return model.prog_spec.set(q, "rhou", rho[..., None] * u)


def _setup(ne, poly, nf=None):
    r = [np.linspace(-L, L, ne + 1), np.linspace(-L, L, ne + 1),
         np.linspace(-L, L, 2)]
    topo = brick_topology(r, periodicity=(True, True, True))
    grid = make_grid(topo, poly, dtype=np.float64)
    physics = AtmosPhysics(orientation=NoOrientation())
    model = AtmosModel(
        physics,
        AtmosProblem(init_state=lambda m, c, aux, t: vortex_state(m, c, t),
                     boundary_conditions=(AtmosBC(),)))
    kwargs = {}
    if nf is not None:
        kwargs["numerical_flux_first_order"] = nf
    dg = DGModel(model, grid, **kwargs)
    q0, aux = init_ode_state(dg)
    return model, grid, dg, q0, aux


def _advance(model, grid, dg, q0, aux, t_end):
    dt = 0.4 * float(min_node_distance(grid)) / 400.0
    nsteps = int(np.ceil(t_end / dt))
    dt = t_end / nsteps
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    q, t = q0, 0.0
    for _ in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    return q, t


def _l2_error(model, grid, q, q_exact):
    M = grid.M
    err = 0.0
    for name in ["rho", "rhou", "rhoe"]:
        sl = model.prog_spec.index(name)
        d = np.asarray(q[..., sl] - q_exact[..., sl])
        scale = np.abs(np.asarray(q_exact[..., sl])).max()
        err += float((np.asarray(M)[..., None] * d * d).sum()) / scale ** 2
    return np.sqrt(err)


def test_vortex_h_convergence():
    """L2 error vs the exact solution decays at ~O(h^{p+1}) (reference
    isentropicvortex.jl expected rates)."""
    poly = 3
    t_end = 2 * L / U_T / 4          # quarter crossing
    errs = []
    for ne in (8, 16, 32):
        model, grid, dg, q0, aux = _setup(ne, poly)
        q, t = _advance(model, grid, dg, q0, aux, t_end)
        q_ex = vortex_state(model, grid.coords, t)
        errs.append(_l2_error(model, grid, q, q_ex))
    r1 = np.log2(errs[0] / errs[1])
    r2 = np.log2(errs[1] / errs[2])
    assert r2 > poly + 0.5 and r1 > poly - 0.5, (errs, r1, r2)


@pytest.mark.parametrize("nf", [None, RoeNumericalFlux(),
                                HLLCNumericalFlux()])
def test_vortex_fluxes_accurate(nf):
    """All first-order flux variants track the exact vortex (reference
    runs every integrator/flux combination)."""
    model, grid, dg, q0, aux = _setup(8, 4, nf)
    t_end = 2 * L / U_T / 8
    q, t = _advance(model, grid, dg, q0, aux, t_end)
    q_ex = vortex_state(model, grid.coords, t)
    assert _l2_error(model, grid, q, q_ex) < 3e-4
    # conservation to round-off (periodic domain)
    for name in ["rho", "rhoe"]:
        sl = model.prog_spec.index(name).start
        a = float(weightedsum(grid, q0, sl))
        b = float(weightedsum(grid, q, sl))
        assert abs(a - b) / abs(a) < 1e-12
