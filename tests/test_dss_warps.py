"""DSS and cubed-sphere warp variants (reference
src/Numerics/Mesh/DSS.jl, Topologies.jl warp family)."""

import jax.numpy as jnp
import numpy as np
import pytest

from climatemachine_tpu.mesh import topology as topo
from climatemachine_tpu.mesh.dss import DSSMap, dss
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.utils.ftypes import set_default_float


@pytest.fixture(autouse=True)
def _f64():
    set_default_float(np.float64)
    yield
    set_default_float(np.float32)


def _jump_field(grid):
    """Element-wise constant (discontinuous across every face)."""
    E = grid.nelem
    rng = np.random.default_rng(0)
    return jnp.asarray(np.repeat(rng.random((E, 1, 1)), grid.Np, axis=1)
                       * np.ones((1, 1, 2)))


@pytest.mark.parametrize("mesh", ["brick", "sphere"])
def test_dss_makes_continuous(mesh):
    if mesh == "brick":
        r = [np.linspace(0, 1, 4)] * 3
        t = topo.brick_topology(r, periodicity=(False, False, False),
                                boundary=np.ones((3, 2), dtype=int))
        g = make_grid(t, 3)
    else:
        t = topo.stacked_cubed_sphere_topology(2, np.linspace(1, 1.4, 3))
        g = make_grid(t, 3)
    m = DSSMap(g)
    x = _jump_field(g)
    y = m.average(x)
    # continuity: coincident nodes share one value
    coords = np.asarray(g.coords).reshape(-1, 3)
    yf = np.asarray(y).reshape(-1, y.shape[-1])
    q = np.round(coords / (np.abs(coords).max() * 1e-10)).astype(np.int64)
    _, inv = np.unique(q, axis=0, return_inverse=True)
    for gidx in np.unique(inv)[:200]:
        sel = yf[inv == gidx]
        assert np.allclose(sel, sel[0], atol=1e-12)
    # projection is idempotent
    y2 = m.average(y)
    assert float(jnp.max(jnp.abs(y2 - y))) < 1e-12
    # continuous fields are fixed points
    smooth = jnp.sin(g.coords[..., 0:1]) * jnp.cos(g.coords[..., 1:2])
    smooth = jnp.concatenate([smooth, smooth], axis=-1)
    assert float(jnp.max(jnp.abs(m.average(smooth) - smooth))) < 1e-10
    # plain sum counts multiplicity
    ones = jnp.ones_like(x)
    s = m.sum(ones)
    assert float(jnp.min(s)) >= 1.0
    assert float(jnp.max(s)) >= 2.0       # interior faces counted twice+


def test_equidistant_warp_sphere():
    """Equidistant warp lands exactly on the sphere with uniform great-
    circle spacing along cube-face center lines."""
    t = topo.stacked_cubed_sphere_topology(3, np.linspace(1.0, 1.2, 2),
                                           warp="equidistant")
    g = make_grid(t, 3)
    r = jnp.linalg.norm(g.coords, axis=-1)
    assert 0.999 <= float(jnp.min(r)) and float(jnp.max(r)) <= 1.201
    # free-stream preservation on the warped grid
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.testing.advection_diffusion import (
        AdvectionDiffusion)
    bl = AdvectionDiffusion(u=(0.4, -0.2, 0.7),
                            init_fn=lambda c, t: jnp.ones(c.shape[:-1]))
    dg = DGModel(bl, g)
    q, aux = init_ode_state(dg)
    tend, _ = dg(q, aux, 0.0)
    assert float(jnp.max(jnp.abs(tend))) < 1e-10


def test_conformal_warp():
    """Rancic conformal mapping: lands on the sphere, maps face centers /
    cube corners exactly, is conformal (orthogonal, isotropic metric),
    and is continuous across cube edges."""
    # cube corners -> sphere corners
    x, y, z = topo.conformal_cubed_sphere_warp(
        np.array([1.0, -1.0]), np.array([1.0, -1.0]), np.array([1.0, -1.0]))
    np.testing.assert_allclose(
        np.stack([x, y, z], -1),
        np.array([[1, 1, 1], [-1, -1, -1]]) / np.sqrt(3), atol=1e-12)
    # face center
    x, y, z = topo.conformal_cubed_sphere_warp(0.0, 0.0, 1.0)
    np.testing.assert_allclose([x, y, z], [0, 0, 1], atol=1e-9)
    # radius preserved for arbitrary points on the cube |.|_inf = R
    u = np.linspace(-0.9, 0.9, 7)
    uu, vv = np.meshgrid(u, u)
    R = 6.371
    x, y, z = topo.conformal_cubed_sphere_warp(
        uu * R, vv * R, np.full_like(uu, R))
    np.testing.assert_allclose(np.sqrt(x**2 + y**2 + z**2), R, rtol=1e-12)

    # conformality on the top face: numeric Jacobian has orthogonal
    # columns of equal length
    h = 1e-6

    def P(a, b):
        return np.stack(topo.conformal_cubed_sphere_warp(
            a, b, np.ones_like(a)), -1)

    p0 = P(uu, vv)
    dx = (P(uu + h, vv) - P(uu - h, vv)) / (2 * h)
    dy = (P(uu, vv + h) - P(uu, vv - h)) / (2 * h)
    dot = np.abs((dx * dy).sum(-1))
    nx = np.linalg.norm(dx, axis=-1)
    ny = np.linalg.norm(dy, axis=-1)
    assert dot.max() / (nx * ny).max() < 1e-5
    np.testing.assert_allclose(nx, ny, rtol=1e-4)
    assert np.isfinite(p0).all()

    # continuity across the x3=+1 / x1=+1 cube edge
    t = np.linspace(-1, 1, 9)
    a = np.stack(topo.conformal_cubed_sphere_warp(
        np.ones_like(t), t, np.ones_like(t) - 1e-12), -1)
    b = np.stack(topo.conformal_cubed_sphere_warp(
        np.ones_like(t) - 1e-12, t, np.ones_like(t)), -1)
    np.testing.assert_allclose(a, b, atol=1e-7)

    # grid builds and free-streams
    tpo = topo.stacked_cubed_sphere_topology(2, np.linspace(1.0, 1.2, 2),
                                             warp="conformal")
    g = make_grid(tpo, 3)
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.testing.advection_diffusion import (
        AdvectionDiffusion)
    bl = AdvectionDiffusion(u=(0.4, -0.2, 0.7),
                            init_fn=lambda c, t: jnp.ones(c.shape[:-1]))
    dg = DGModel(bl, g)
    q, aux = init_ode_state(dg)
    tend, _ = dg(q, aux, 0.0)
    assert float(jnp.max(jnp.abs(tend))) < 1e-10


def test_warp_variants_differ():
    """Equiangular vs equidistant give different interior node spacing
    but identical panel corners."""
    lin = np.linspace(-1, 1, 5)
    x = lin * 1.0
    ea = topo.equiangular_cubed_sphere_warp(
        np.ones_like(x), x, np.zeros_like(x))
    ed = topo.equidistant_cubed_sphere_warp(
        np.ones_like(x), x, np.zeros_like(x))
    ea = np.stack(ea, -1)
    ed = np.stack(ed, -1)
    assert np.allclose(np.linalg.norm(ea, axis=-1), 1.0)
    assert np.allclose(np.linalg.norm(ed, axis=-1), 1.0)
    assert np.allclose(ea[[0, -1]], ed[[0, -1]])     # corners agree
    assert np.abs(ea[1] - ed[1]).max() > 1e-3        # interiors differ
