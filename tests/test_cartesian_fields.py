"""SpectralElementField Cartesian views (reference
src/Common/CartesianFields: structured element indexing + assemble with
averaged contact nodes)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.common.cartesian_fields import SpectralElementField
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_brick_topology


def _brick(ne=(3, 2, 2), poly=3, ext=(6.0, 4.0, 2.0)):
    r = [np.linspace(0, ext[d], ne[d] + 1) for d in range(3)]
    topo = stacked_brick_topology(
        r, periodicity=(False, False, False),
        boundary=np.array([[1, 1], [1, 1], [1, 2]]))
    return make_grid(topo, poly, dtype=np.float64)


def test_elements_view_is_structured():
    """elements[i,j,k,a,b,c] carries x,y,z ascending along i/a, j/b, k/c."""
    grid = _brick()
    for dim in range(3):
        f = SpectralElementField(grid, grid.coords[..., dim])
        el = np.asarray(f.elements)
        assert el.shape == (3, 2, 2, 4, 4, 4)
        # ascending along the matching element and node axes
        d_e = np.diff(el, axis=dim)
        d_n = np.diff(el, axis=3 + dim)
        assert (d_e > 0).all() and (d_n > 0).all()
        # constant along every other axis
        for other in range(3):
            if other != dim:
                assert np.allclose(np.diff(el, axis=other), 0)
                assert np.allclose(np.diff(el, axis=3 + other), 0)


def test_assemble_continuous_and_exact():
    """assemble() reproduces a smooth function on the global Cartesian
    node grid; duplicated interface nodes average to the exact value."""
    grid = _brick()
    x = grid.coords[..., 0]
    y = grid.coords[..., 1]
    z = grid.coords[..., 2]
    fn = lambda x, y, z: jnp.sin(x) * jnp.cos(0.5 * y) + z**2
    f = SpectralElementField(grid, fn(x, y, z))
    out = np.asarray(f.assemble())
    nx = (3 * 3 + 1, 2 * 3 + 1, 2 * 3 + 1)
    assert out.shape == nx
    X, Y, Z = np.meshgrid(f.x, f.y, f.z, indexing="ij")
    np.testing.assert_allclose(out, np.asarray(fn(X, Y, Z)), atol=1e-12)
    # assembled coordinates span the domain and are sorted
    assert f.x[0] == 0 and abs(f.x[-1] - 6.0) < 1e-12
    assert (np.diff(f.x) > 0).all() and (np.diff(f.z) > 0).all()


def test_supermodel_cartesian_field():
    """SuperModel.cartesian_field: eta view matches the raw node field."""
    from climatemachine_tpu.ocean.super_model import (
        HydrostaticBoussinesqSuperModel, InitialConditions,
        RectangularDomain)

    domain = RectangularDomain(Ne=(4, 4, 2), Np=3,
                               x=(0, 1e5), y=(0, 1e5), z=(-400, 0))
    ics = InitialConditions(
        u=lambda x, y, z: 0.1 * jnp.sin(2 * jnp.pi * x / 1e5),
        eta=lambda x, y, z: 0.05 * jnp.cos(2 * jnp.pi * y / 1e5))
    model = HydrostaticBoussinesqSuperModel(
        domain, time_step=60.0, initial_conditions=ics)
    f = model.cartesian_field("eta")
    el = f.elements
    assert el.shape == (4, 4, 2, 4, 4, 4)
    asm = np.asarray(f.assemble())
    assert asm.shape == (13, 13, 7)
    # eta must be independent of z and match the IC pattern at the surface
    assert np.allclose(asm[..., 0], asm[..., -1], atol=1e-12)
    expected = 0.05 * np.cos(2 * np.pi * np.asarray(f.y) / 1e5)
    np.testing.assert_allclose(asm[0, :, -1], expected, atol=1e-10)
