"""Grid / topology / metric tests (model: reference
test/Numerics/Mesh/{BrickMesh,Metrics,mpi_connect*,grid_integral}.jl)."""

import numpy as np
import pytest

from climatemachine_tpu.mesh import grid as gridmod
from climatemachine_tpu.mesh import topology as topo
from climatemachine_tpu.utils.ftypes import set_default_float


@pytest.fixture(autouse=True)
def _f64():
    set_default_float(np.float64)
    yield
    set_default_float(np.float32)


def _check_face_coords_match(g):
    """Interior faces: my face-node coords == neighbor face-node coords.
    This validates fmask ordering + orientation codes end-to-end."""
    coords = np.asarray(g.coords).reshape(-1, g.coords.shape[-1])
    vmapM = np.asarray(g.vmapM)
    vmapP = np.asarray(g.vmapP)
    bctag = np.asarray(g.face_bctag)
    sM = np.asarray(g.sM)
    for f in range(g.nface):
        interior = bctag[:, f] == 0
        active = sM[interior, f, :] > 0
        cm = coords[vmapM[interior, f, :]][active]
        cp = coords[vmapP[interior, f, :]][active]
        # periodic wrap: coordinates may differ by the domain extent;
        # compare modulo the bounding box size per axis
        ext = coords.max(axis=0) - coords.min(axis=0)
        d = np.abs(cm - cp)
        for ax in range(d.shape[-1]):
            if ext[ax] > 0:
                d[:, ax] = np.minimum(d[:, ax], np.abs(d[:, ax] - ext[ax]))
        assert d.max() < 1e-10 * max(1.0, ext.max()), (f, d.max())


def test_brick_3d_connectivity_and_metrics():
    ranges = [np.linspace(0, 2, 4), np.linspace(0, 1, 3), np.linspace(0, 3, 5)]
    t = topo.brick_topology(ranges, periodicity=(False, True, False))
    g = gridmod.make_grid(t, 3)
    # volume: sum of mass = volume of box
    vol = float(np.sum(np.asarray(g.M)))
    assert np.isclose(vol, 2 * 1 * 3, rtol=1e-12)
    # normals are unit where active
    n = np.asarray(g.normals)
    sM = np.asarray(g.sM)
    nn = np.linalg.norm(n, axis=-1)
    assert np.allclose(nn[sM > 0], 1.0, atol=1e-12)
    _check_face_coords_match(g)


def test_stacked_brick_column_ordering():
    ranges = [np.linspace(0, 1, 3), np.linspace(0, 1, 3), np.linspace(0, 1, 5)]
    t = topo.stacked_brick_topology(
        ranges, periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    assert t.stack.n_horz == 4 and t.stack.n_vert == 4
    g = gridmod.make_grid(t, 2)
    # elements of one column are contiguous: e = eh*n_vert + ev, increasing z
    coords = np.asarray(g.coords)
    for eh in range(4):
        zmins = [coords[eh * 4 + ev, :, 2].min() for ev in range(4)]
        assert np.all(np.diff(zmins) > 0)
    # top face (f=5) of lowest element connects to element above
    assert t.face_neighbor[0, 5] == 1
    assert t.face_bctag[0, 4] == 1 and t.face_bctag[3, 5] == 2
    _check_face_coords_match(g)


def test_single_stack():
    t = topo.single_stack_topology(1.0, 1.0, np.linspace(0, 10, 6))
    g = gridmod.make_grid(t, (1, 3))
    assert g.Nq == (2, 2, 4)
    vol = float(np.sum(np.asarray(g.M)))
    assert np.isclose(vol, 10.0, rtol=1e-12)
    _check_face_coords_match(g)


def test_cubed_shell_closed_and_matched():
    t = topo.cubed_shell_topology(3)
    assert t.nelem == 6 * 9
    assert (t.face_bctag == 0).all()
    # every face matched symmetrically
    for e in range(t.nelem):
        for f in range(4):
            ne, nf = t.face_neighbor[e, f], t.face_neighbor_face[e, f]
            assert t.face_neighbor[ne, nf] == e
            assert t.face_neighbor_face[ne, nf] == f


def test_stacked_cubed_sphere_geometry():
    r_in, r_out = 1.0, 1.2
    t = topo.stacked_cubed_sphere_topology(4, np.linspace(r_in, r_out, 3))
    g = gridmod.make_grid(t, 3)
    # shell volume: 4/3 pi (r_out^3 - r_in^3); spectral accuracy but the
    # sphere is approximated by the warp exactly, quadrature error only
    vol = float(np.sum(np.asarray(g.M)))
    exact = 4 / 3 * np.pi * (r_out ** 3 - r_in ** 3)
    assert np.isclose(vol, exact, rtol=1e-6)
    # all nodes between the radii
    r = np.linalg.norm(np.asarray(g.coords), axis=-1)
    assert r.min() > r_in * (1 - 1e-9) and r.max() < r_out * (1 + 1e-9)
    # face nodes coincide across panel edges (the crucial orientation test)
    _check_face_coords_match(g)
    # bottom/top faces have radial normals
    n = np.asarray(g.normals)
    coords = np.asarray(g.coords).reshape(-1, 3)
    vmapM = np.asarray(g.vmapM)
    xb = coords[vmapM[:, 4, :]]
    rb = xb / np.linalg.norm(xb, axis=-1, keepdims=True)
    assert np.allclose(np.abs(np.sum(n[:, 4, :, :] * rb, axis=-1)), 1.0,
                       atol=1e-10)


def test_min_node_distance():
    ranges = [np.linspace(0, 1, 3), np.linspace(0, 1, 3),
              np.linspace(0, 10, 3)]
    t = topo.stacked_brick_topology(ranges, periodicity=(True, True, False))
    g = gridmod.make_grid(t, 4)
    mh = gridmod.min_node_distance(g, "horizontal")
    mv = gridmod.min_node_distance(g, "vertical")
    assert mv > mh  # vertical elements are 10x taller
    me = gridmod.min_node_distance(g, "every")
    assert me == mh
