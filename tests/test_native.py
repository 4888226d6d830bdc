"""Native C++ mesh runtime (climatemachine_tpu/native): parity with the
NumPy reference implementation + Hilbert SFC properties (reference
BrickMesh.jl hilbertcode/partition, Topologies.jl connectmesh)."""

import os

import numpy as np
import pytest

from climatemachine_tpu import native
from climatemachine_tpu.mesh import topology as topo


def _numpy_connect(dim, e2v, default_bctags=None):
    """Force the pure-Python path."""
    os.environ["CLIMATEMACHINE_TPU_NO_NATIVE"] = "1"
    native._tried, native._lib = True, None
    try:
        return topo.connect_from_vertices(dim, e2v, default_bctags)
    finally:
        del os.environ["CLIMATEMACHINE_TPU_NO_NATIVE"]
        native._tried = False


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ toolchain present in this image; " \
        "native library must build"


def _brick_e2v(nel):
    """Structured-brick element->vertex table (corner = bitmask cx+2cy+4cz
    order, matching _FACE_CORNERS)."""
    dim = len(nel)
    nv = [n + 1 for n in nel]
    e2v = []
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in nel],
                               indexing="ij"), -1).reshape(-1, dim)
    # element order irrelevant for the parity test
    for ijk in idx:
        corners = []
        for c in range(2 ** dim):
            off = [(c >> d) & 1 for d in range(dim)]
            vid, stride = 0, 1
            for d in range(dim):
                vid += (ijk[d] + off[d]) * stride
                stride *= nv[d]
            corners.append(vid)
        e2v.append(corners)
    return np.asarray(e2v, dtype=np.int64)


@pytest.mark.parametrize("mesh", ["brick3", "sphere", "brick2"])
def test_connect_faces_native_matches_numpy(mesh):
    if mesh == "brick3":
        e2v = _brick_e2v([3, 3, 3])
        dim = 3
    elif mesh == "brick2":
        e2v = _brick_e2v([4, 4])
        dim = 2
    else:
        e2v, _ = topo.cubed_shell_vertices(3)
        dim = 2
    nb_n = native.connect_faces_native(dim, e2v)
    assert nb_n is not None
    nb_p = _numpy_connect(dim, e2v)
    for a, b, name in zip(nb_n, nb_p,
                          ["neighbor", "neighbor_face", "orient", "bctag"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_connect_faces_native_bctags():
    e2v = _brick_e2v([2, 2, 2])
    tags = np.random.default_rng(0).integers(1, 5, size=(8, 6)) \
        .astype(np.int32)
    nb_n = native.connect_faces_native(3, e2v, tags)
    nb_p = _numpy_connect(3, e2v, tags)
    for a, b in zip(nb_n, nb_p):
        np.testing.assert_array_equal(a, b)


def test_hilbert_codes_locality():
    """Hilbert codes: distinct per cell, and consecutive codes are
    adjacent cells (unit step property of the Hilbert curve)."""
    n = 8
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float64)
    codes = native.hilbert_codes(g, nbits=3)
    assert len(np.unique(codes)) == len(codes)
    order = np.argsort(codes)
    pts = g[order]
    if native.get_lib() is not None:
        # true Hilbert: every step moves exactly one unit in one axis
        steps = np.abs(np.diff(pts, axis=0)).sum(axis=1)
        assert (steps == 1).all()
    # locality either way: mean step length small
    assert np.abs(np.diff(pts, axis=0)).sum(axis=1).mean() < 2.0


def test_sfc_order_partition_quality():
    """Contiguous runs of the SFC order have small surface/volume ratio
    compared to naive index order on a flattened 2-D mesh (why the
    reference partitions along the curve, BrickMesh.jl:115)."""
    n = 16
    g = np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"),
                 axis=-1).reshape(-1, 2).astype(np.float64)
    order = native.sfc_order(g)
    nparts = 8
    size = len(g) // nparts

    def cut_edges(perm):
        part = np.empty(len(g), dtype=int)
        part[perm] = np.arange(len(g)) // size
        pid = part.reshape(n, n)
        return (pid[1:, :] != pid[:-1, :]).sum() + \
            (pid[:, 1:] != pid[:, :-1]).sum()

    naive = cut_edges(np.arange(len(g)))
    sfc = cut_edges(order)
    assert sfc <= naive * 1.05
