"""Curvilinear metric terms for spectral elements (host-side, numpy f64).

Scope of reference ``src/Numerics/Mesh/Metrics.jl`` (creategrid! :26,
computemetric!).  The 3-D contravariant metrics use the discrete
curl-invariant form (Kopriva 2006, "Metric identities and the DG-SEM on
curvilinear meshes") so that free-stream preservation holds discretely on
warped grids (cubed sphere) — same formulation the reference uses, written
here as vectorized einsums over ``[E, Nq3, Nq2, Nq1]`` node blocks.

Node convention: flat node n = i + Nq1*(j + Nq2*k); arrays are reshaped to
``[E, Nq3, Nq2, Nq1]`` (k slowest) so that axis -1 is xi1.
"""

from __future__ import annotations

import numpy as np


def nodal_coordinates(elem_to_coord: np.ndarray, xi: list[np.ndarray], dim: int):
    """Tri/bi-linear interpolation of element corner coords to LGL nodes.

    elem_to_coord: [E, 2^dim, ncoord]; xi: per-dim 1-D node arrays in [-1,1].
    Returns [E, Nq_dim..., ncoord] with k slowest / i fastest ordering,
    i.e. shape (E, Nq[dim-1], ..., Nq[0], ncoord).
    """
    E, ncorn, ncoord = elem_to_coord.shape
    assert ncorn == 2 ** dim
    # basis per dim: [(1-xi)/2, (1+xi)/2]; weight tensor ordered slowest->fastest
    out = None
    for c in range(ncorn):
        bs = []
        for d in range(dim - 1, -1, -1):
            cd = (c >> d) & 1
            bs.append((1 + xi[d]) / 2 if cd else (1 - xi[d]) / 2)
        w = bs[0]
        for b in bs[1:]:
            w = np.multiply.outer(w, b)
        term = elem_to_coord[:, c, :][:, None, :] * w.reshape(1, -1, 1)
        out = term if out is None else out + term
    Nq_shape = tuple(len(xi[d]) for d in range(dim - 1, -1, -1))
    return out.reshape((E,) + Nq_shape + (ncoord,))


def _dmat_apply(D: np.ndarray, x: np.ndarray, refdim: int, dim: int):
    """Apply 1-D derivative matrix along reference dim ``refdim`` (0-based,
    xi1=0) of x with shape [E, Nq_{dim-1},...,Nq_0, ...trailing]."""
    axis = dim - refdim  # x axes: 0=E, 1=slowest refdim, ..., dim=fastest
    return np.moveaxis(
        np.tensordot(x, D, axes=([axis], [1])), -1, axis)


def geometry_3d(coords: np.ndarray, D: tuple[np.ndarray, ...],
                w: tuple[np.ndarray, ...], dx_dxi3: np.ndarray = None):
    """3-D volume + surface geometry.

    coords: [E, Nq3, Nq2, Nq1, 3] physical nodal coordinates.
    D: (D1, D2, D3) derivative matrices; w: (w1, w2, w3) LGL weights.

    Returns dict with:
      M, MI        [E, Np]           mass (w (x) J) and inverse
      xi_x         [E, Np, 3, 3]     contravariant d(xi_a)/d(x_i), [a, i]
      JcV          [E, Np]           vertical line Jacobian |dx/dxi3|
      J            [E, Np]
      sgeo normals n [E, 6, Nfp_max, 3], sM [E, 6, Nfp_max] (w_tang * J|grad xi|),
      face node masks handled by caller via fmask.
    """
    E = coords.shape[0]
    Nq3, Nq2, Nq1 = coords.shape[1:4]
    Np = Nq1 * Nq2 * Nq3
    x = [coords[..., i] for i in range(3)]

    # dx_i/dxi_a
    dx = np.empty((E, Nq3, Nq2, Nq1, 3, 3))
    for a in range(3):
        for i in range(3):
            dx[..., i, a] = _dmat_apply(D[a], x[i], a, 3)
    if dx_dxi3 is not None:
        # FV vertical (Nq3 == 1): the nodal derivative along xi3 vanishes
        # (single node); use the analytic cell-thickness derivative
        # (reference DGFV polyorder_vert=0 geometry)
        dx[..., :, 2] = dx_dxi3

    J = (dx[..., 0, 0] * (dx[..., 1, 1] * dx[..., 2, 2] - dx[..., 2, 1] * dx[..., 1, 2])
         + dx[..., 1, 0] * (dx[..., 2, 1] * dx[..., 0, 2] - dx[..., 0, 1] * dx[..., 2, 2])
         + dx[..., 2, 0] * (dx[..., 0, 1] * dx[..., 1, 2] - dx[..., 1, 1] * dx[..., 0, 2]))
    if np.any(J <= 0):
        raise ValueError(f"non-positive Jacobian: min {J.min():.3e}")
    JcV = np.sqrt(dx[..., 0, 2] ** 2 + dx[..., 1, 2] ** 2 + dx[..., 2, 2] ** 2)

    xi_x = np.zeros((E, Nq3, Nq2, Nq1, 3, 3))
    if dx_dxi3 is not None:
        # direct cross-product metrics (vertical is affine in xi3 for
        # stacked grids, so the curl form is unnecessary)
        a_vecs = [dx[..., :, a] for a in range(3)]
        crosses = [np.cross(a_vecs[1], a_vecs[2]),
                   np.cross(a_vecs[2], a_vecs[0]),
                   np.cross(a_vecs[0], a_vecs[1])]
        for a in range(3):
            for i in range(3):
                xi_x[..., a, i] = crosses[a][..., i] / J
    else:
        # curl-invariant contravariant metrics:
        #   J * d(xi_a)/d(x_i) = (1/2)*[D_{a+1}(V^i_{a+2}) - D_{a+2}(V^i_{a+1})]
        # where V^i_a = x_{i+1} * d(x_{i+2})/d(xi_a) - x_{i+2} * d(x_{i+1})/d(xi_a)
        # (cyclic indices), cf. reference Metrics.jl:431-... (yz/zx/xy arrays).
        for i in range(3):
            i1, i2 = (i + 1) % 3, (i + 2) % 3
            V = np.empty((E, Nq3, Nq2, Nq1, 3))
            for a in range(3):
                V[..., a] = x[i1] * dx[..., i2, a] - x[i2] * dx[..., i1, a]
            for a in range(3):
                a1, a2 = (a + 1) % 3, (a + 2) % 3
                xi_x[..., a, i] = 0.5 * (
                    _dmat_apply(D[a1], V[..., a2], a1, 3)
                    - _dmat_apply(D[a2], V[..., a1], a2, 3)) / J

    # mass matrix: tensor-product weights * J
    wt = np.multiply.outer(np.multiply.outer(w[2], w[1]), w[0])  # [Nq3,Nq2,Nq1]
    M = wt[None] * J
    MI = 1.0 / M

    # surface geometry: for face f = 2d+s, unnormalized normal = sign * J*grad(xi_d)
    # evaluated at the face nodes; sM = |J grad xi_d| * (tangential weights)
    Nfp = (Nq2 * Nq3, Nq2 * Nq3, Nq1 * Nq3, Nq1 * Nq3, Nq1 * Nq2, Nq1 * Nq2)
    Nfp_max = max(Nfp)
    n_out = np.zeros((E, 6, Nfp_max, 3))
    sM = np.zeros((E, 6, Nfp_max))

    Jxi = xi_x * J[..., None, None]  # J * grad xi
    for d in range(3):
        for s in (0, 1):
            f = 2 * d + s
            sign = 1.0 if s else -1.0
            if d == 0:
                sl = (slice(None), slice(None), slice(None), -1 if s else 0)
                tw = np.multiply.outer(w[2], w[1]).reshape(-1)  # (k slow, j fast)
            elif d == 1:
                sl = (slice(None), slice(None), -1 if s else 0, slice(None))
                tw = np.multiply.outer(w[2], w[0]).reshape(-1)
            else:
                sl = (slice(None), -1 if s else 0, slice(None), slice(None))
                tw = np.multiply.outer(w[1], w[0]).reshape(-1)
            nf = sign * Jxi[sl + (d, slice(None))].reshape(E, -1, 3)
            norm = np.linalg.norm(nf, axis=-1)
            n_out[:, f, :Nfp[f], :] = nf / norm[..., None]
            sM[:, f, :Nfp[f]] = norm * tw[None, :]

    flat = lambda a: a.reshape(E, Np)
    return dict(
        J=flat(J), M=flat(M), MI=flat(MI), JcV=flat(JcV),
        xi_x=xi_x.reshape(E, Np, 3, 3),
        coords=coords.reshape(E, Np, 3),
        normals=n_out, sM=sM, Nfp=Nfp,
    )


def geometry_2d(coords: np.ndarray, D: tuple[np.ndarray, ...],
                w: tuple[np.ndarray, ...]):
    """2-D planar volume + surface geometry. coords: [E, Nq2, Nq1, 2]."""
    E, Nq2, Nq1 = coords.shape[:3]
    Np = Nq1 * Nq2
    x = [coords[..., i] for i in range(2)]
    dx = np.empty((E, Nq2, Nq1, 2, 2))
    for a in range(2):
        for i in range(2):
            dx[..., i, a] = _dmat_apply(D[a], x[i], a, 2)
    J = dx[..., 0, 0] * dx[..., 1, 1] - dx[..., 1, 0] * dx[..., 0, 1]
    if np.any(J <= 0):
        raise ValueError(f"non-positive Jacobian: min {J.min():.3e}")
    xi_x = np.zeros((E, Nq2, Nq1, 2, 2))
    xi_x[..., 0, 0] = dx[..., 1, 1] / J
    xi_x[..., 0, 1] = -dx[..., 0, 1] / J
    xi_x[..., 1, 0] = -dx[..., 1, 0] / J
    xi_x[..., 1, 1] = dx[..., 0, 0] / J
    JcV = np.sqrt(dx[..., 0, 1] ** 2 + dx[..., 1, 1] ** 2)

    wt = np.multiply.outer(w[1], w[0])
    M = wt[None] * J
    MI = 1.0 / M

    Nfp = (Nq2, Nq2, Nq1, Nq1)
    Nfp_max = max(Nfp)
    n_out = np.zeros((E, 4, Nfp_max, 2))
    sM = np.zeros((E, 4, Nfp_max))
    Jxi = xi_x * J[..., None, None]
    for d in range(2):
        for s in (0, 1):
            f = 2 * d + s
            sign = 1.0 if s else -1.0
            if d == 0:
                sl = (slice(None), slice(None), -1 if s else 0)
                tw = w[1]
            else:
                sl = (slice(None), -1 if s else 0, slice(None))
                tw = w[0]
            nf = sign * Jxi[sl + (d, slice(None))].reshape(E, -1, 2)
            norm = np.linalg.norm(nf, axis=-1)
            n_out[:, f, :Nfp[f], :] = nf / norm[..., None]
            sM[:, f, :Nfp[f]] = norm * tw[None, :]

    flat = lambda a: a.reshape(E, Np)
    return dict(
        J=flat(J), M=flat(M), MI=flat(MI), JcV=flat(JcV),
        xi_x=xi_x.reshape(E, Np, 2, 2),
        coords=coords.reshape(E, Np, 2),
        normals=n_out, sM=sM, Nfp=Nfp,
    )
