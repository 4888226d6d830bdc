"""DG operator verification against exact solutions (model: reference
test/Numerics/DGMethods/advection_diffusion + Euler/isentropicvortex
convergence-rate tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh import topology as topo
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy
from climatemachine_tpu.ode.solve import solve
from climatemachine_tpu.testing.advection_diffusion import AdvectionDiffusion
from climatemachine_tpu.utils.ftypes import set_default_float


@pytest.fixture(autouse=True)
def _f64():
    set_default_float(np.float64)
    yield
    set_default_float(np.float32)


def l2_norm(grid, q):
    return float(jnp.sqrt(jnp.sum(grid.M[..., None] * q ** 2)))


def test_free_stream_preservation_cubed_sphere():
    """Constant state must stay constant on a warped grid: the discrete
    metric identities (curl-invariant form) at work."""
    t = topo.stacked_cubed_sphere_topology(3, np.linspace(1.0, 1.5, 3))
    g = make_grid(t, 4)
    bl = AdvectionDiffusion(u=(0.3, -0.2, 0.9),
                            init_fn=lambda c, t: jnp.ones(c.shape[:-1]))
    dg = DGModel(bl, g)
    q, aux = init_ode_state(dg)
    tend, _ = jax.jit(dg)(q, aux, 0.0)
    assert float(jnp.max(jnp.abs(tend))) < 1e-10


def test_advection_exactness_and_conservation():
    """Sine wave advected one period through a periodic 3-D box returns to
    itself; mass is conserved to round-off."""
    ranges = [np.linspace(0, 1, 5), np.linspace(0, 1, 3), np.linspace(0, 1, 3)]
    t = topo.brick_topology(ranges, periodicity=(True, True, True))
    g = make_grid(t, 4)

    def ic(c, t):
        return jnp.sin(2 * np.pi * c[..., 0]) * jnp.cos(2 * np.pi * c[..., 1])

    bl = AdvectionDiffusion(u=(1.0, 0.5, 0.0), init_fn=ic)
    dg = DGModel(bl, g)
    q0, aux = init_ode_state(dg)
    mass0 = float(jnp.sum(g.M[..., None] * q0))

    dt = 0.002
    solver = LSRK54CarpenterKennedy(dg, dt)
    # after t=2, u=(1,0.5): x advances 2 periods, y advances 1 period
    state = solve(q0, aux, solver, timeend=2.0)
    err = l2_norm(g, state.q - q0) / l2_norm(g, q0)
    # coarse grid (4x2x2 elements): discretization error dominates; the
    # h-convergence test below verifies the order
    assert err < 3e-2, err
    mass1 = float(jnp.sum(g.M[..., None] * state.q))
    assert np.isclose(mass0, mass1, atol=1e-12)


def test_advection_h_convergence():
    """L2 error decays at ~ (N+1) order under mesh refinement."""
    N = 3
    errs = []
    for nel in (2, 4, 8):
        ranges = [np.linspace(0, 1, nel + 1), np.linspace(0, 1, 2)]
        t = topo.brick_topology(ranges, periodicity=(True, True))
        g = make_grid(t, N)

        def ic(c, tt=0.0):
            return jnp.sin(2 * np.pi * (c[..., 0] - tt))

        bl = AdvectionDiffusion(u=(1.0, 0.0), init_fn=ic, ncoord=2)
        dg = DGModel(bl, g)
        q0, aux = init_ode_state(dg)
        dt = 0.2 / (nel * (N + 1) ** 2)
        solver = LSRK54CarpenterKennedy(dg, dt)
        state = solve(q0, aux, solver, timeend=0.5)
        exact = ic(np.asarray(g.coords), 0.5)[..., None]
        errs.append(l2_norm(g, state.q - exact))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate2 > N + 0.5, (errs, rate1, rate2)


def test_diffusion_decay_rate():
    """Heat equation: sin(2 pi x) decays as exp(-4 pi^2 D t)."""
    D = 0.01
    ranges = [np.linspace(0, 1, 6), np.linspace(0, 1, 2)]
    t = topo.brick_topology(ranges, periodicity=(True, True))
    g = make_grid(t, 4)

    def ic(c, tt=0.0):
        return jnp.sin(2 * np.pi * c[..., 0])

    bl = AdvectionDiffusion(u=(0.0, 0.0), diffusivity=D, init_fn=ic, ncoord=2)
    dg = DGModel(bl, g)
    q0, aux = init_ode_state(dg)
    dt = 2e-4
    solver = LSRK54CarpenterKennedy(dg, dt)
    T = 0.2
    state = solve(q0, aux, solver, timeend=T)
    decay = np.exp(-4 * np.pi ** 2 * D * T)
    exact = decay * np.asarray(ic(np.asarray(g.coords)))[..., None]
    err = l2_norm(g, state.q - exact) / l2_norm(g, q0)
    # measured h-convergence of this setup: ~5th order (3->6->12 elements:
    # 7.0e-4 -> 3.0e-5 -> 7.8e-7 absolute); at 5 elements expect ~1e-4
    assert err < 3e-4, err
