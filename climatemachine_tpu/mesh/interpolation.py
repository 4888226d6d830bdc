"""Interpolation of DG nodal data to regular diagnostic grids.

Scope of reference ``src/Numerics/Mesh/Interpolation.jl``
(InterpolationBrick :66, InterpolationCubedSphere, interpolate_local!
:449, project_cubed_sphere! :1373, gather-to-root :304-313).

TPU-first: target-point element ids and per-dimension Lagrange weights
are precomputed host-side (numpy); the interpolation itself is one
element gather + a tensor-product weight einsum (batched MXU), no
per-point loops.  The cubed-sphere inverse map is the closed-form
inverse of the equiangular gnomonic warp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.mesh.topology import _cube_panel_axes


def _barycentric_weights(xi: np.ndarray) -> np.ndarray:
    N = len(xi)
    w = np.ones(N)
    for j in range(N):
        for k in range(N):
            if k != j:
                w[j] /= (xi[j] - xi[k])
    return w


def lagrange_weights(xi: np.ndarray, x: np.ndarray) -> np.ndarray:
    """[P, Nq] interpolation weights of nodes ``xi`` at points ``x``."""
    wb = _barycentric_weights(xi)
    d = x[:, None] - xi[None, :]
    exact = np.abs(d) < 1e-14
    d = np.where(exact, 1.0, d)
    num = wb[None, :] / d
    out = num / num.sum(axis=1, keepdims=True)
    onrow = exact.any(axis=1)
    out[onrow] = exact[onrow].astype(np.float64)
    return out


class _TensorInterpolator:
    """Shared apply: per-point element id + per-dim weights."""

    def __init__(self, grid, elem: np.ndarray, wlist, out_shape):
        self.grid = grid
        self.elem = jnp.asarray(elem, dtype=jnp.int32)
        dtype = grid.coords.dtype
        self.w = [jnp.asarray(w, dtype=dtype) for w in wlist]
        self.out_shape = out_shape

    def __call__(self, f):
        """f: [E, Np, n] -> [*out_shape, n]."""
        g = self.grid
        single = f.ndim == 2
        if single:
            f = f[..., None]
        # multi-controller safety (reference gather-to-root,
        # Interpolation.jl:304-313 MPI.Gatherv!): target points index
        # arbitrary elements, so under multi-controller JAX the shards
        # must first be gathered to every host.  Single-controller
        # (including a single-host multi-device mesh) arrays are fully
        # addressable and skip this.
        # Tracers (inside jit) have no committed sharding; the gather is
        # only needed for concrete multi-controller arrays.
        if (not isinstance(f, jax.core.Tracer)
                and hasattr(f, "is_fully_addressable")
                and not f.is_fully_addressable):
            from jax.experimental import multihost_utils
            f = jnp.asarray(multihost_utils.process_allgather(
                f, tiled=True))
        fe = f[self.elem]                                  # [P, Np, n]
        P = fe.shape[0]
        feb = fe.reshape((P,) + tuple(g.Nq[::-1]) + (f.shape[-1],))
        if g.dim == 3:
            out = jnp.einsum("pk,pj,pi,pkjin->pn", self.w[2], self.w[1],
                             self.w[0], feb)
        else:
            out = jnp.einsum("pj,pi,pjin->pn", self.w[1], self.w[0], feb)
        out = out.reshape(tuple(self.out_shape) + (f.shape[-1],))
        return out[..., 0] if single else out


def InterpolationBrick(grid, x1g, x2g, x3g) -> _TensorInterpolator:
    """Interpolate onto the tensor grid x1g × x2g × x3g (reference :66).

    Requires a (stacked) brick grid with axis-aligned elements."""
    topo = grid.topology
    # recover per-dimension element interfaces from corner coordinates
    corners = topo.elem_to_coord                       # [E, 2^dim, dim]
    mins = corners.min(axis=1)
    interfaces = [np.unique(np.round(
        np.concatenate([corners[:, :, d].reshape(-1)]), 9))
        for d in range(3)]

    P1, P2, P3 = len(x1g), len(x2g), len(x3g)
    X1, X2, X3 = np.meshgrid(x1g, x2g, x3g, indexing="ij")
    pts = np.stack([X1.reshape(-1), X2.reshape(-1), X3.reshape(-1)], axis=-1)
    P = pts.shape[0]

    idx = []
    xi_loc = []
    for d in range(3):
        iv = interfaces[d]
        i = np.clip(np.searchsorted(iv, pts[:, d], side="right") - 1,
                    0, len(iv) - 2)
        idx.append(i)
        x0, x1 = iv[i], iv[i + 1]
        xi_loc.append(2 * (pts[:, d] - x0) / (x1 - x0) - 1)

    nel = [len(iv) - 1 for iv in interfaces]
    # stacked ordering e = eh*nv + ev with eh = ix + nx*iy (brick order)
    if grid.n_vert is not None:
        eh = idx[0] + nel[0] * idx[1]
        elem = eh * nel[2] + idx[2]
    else:
        elem = idx[0] + nel[0] * (idx[1] + nel[1] * idx[2])

    wl = [lagrange_weights(grid.xi[d], xi_loc[d]) for d in range(3)]
    interp = _TensorInterpolator(grid, elem, wl, (P1, P2, P3))
    interp.xyz = (np.asarray(x1g), np.asarray(x2g), np.asarray(x3g))
    return interp


def InterpolationCubedSphere(grid, lats_deg, lons_deg, rads
                             ) -> _TensorInterpolator:
    """Interpolate onto (lat, lon, radius) tensor grid (reference
    InterpolationCubedSphere).  ``rads``: absolute radii [m]."""
    topo = grid.topology
    n_horz = int(round(np.sqrt(topo.stack.n_horz / 6)))
    n_vert = topo.stack.n_vert
    vert_range = topo.vert_range

    lats = np.deg2rad(np.asarray(lats_deg, dtype=np.float64))
    lons = np.deg2rad(np.asarray(lons_deg, dtype=np.float64))
    LAT, LON, RAD = np.meshgrid(lats, lons, np.asarray(rads), indexing="ij")
    shape = LAT.shape
    lat, lon, rad = LAT.reshape(-1), LON.reshape(-1), RAD.reshape(-1)

    u = np.stack([np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon),
                  np.sin(lat)], axis=-1)

    # panel selection + equiangular inverse (see topology.py warp)
    dots = np.zeros((len(lat), 6))
    t1 = np.zeros((len(lat), 6))
    t2 = np.zeros((len(lat), 6))
    for p in range(6):
        nrm, ta, tb = _cube_panel_axes(p)
        dn = u @ nrm
        dots[:, p] = dn
        with np.errstate(divide="ignore", invalid="ignore"):
            t1[:, p] = (4 / np.pi) * np.arctan2(u @ ta, dn)
            t2[:, p] = (4 / np.pi) * np.arctan2(u @ tb, dn)
    panel = np.argmax(dots, axis=1)
    ar = np.arange(len(lat))
    t1 = np.clip(t1[ar, panel], -1.0, 1.0)
    t2 = np.clip(t2[ar, panel], -1.0, 1.0)

    lin = np.linspace(-1.0, 1.0, n_horz + 1)
    ia = np.clip(np.searchsorted(lin, t1, side="right") - 1, 0, n_horz - 1)
    jb = np.clip(np.searchsorted(lin, t2, side="right") - 1, 0, n_horz - 1)
    xi1 = 2 * (t1 - lin[ia]) / (lin[ia + 1] - lin[ia]) - 1
    xi2 = 2 * (t2 - lin[jb]) / (lin[jb + 1] - lin[jb]) - 1

    ev = np.clip(np.searchsorted(vert_range, rad, side="right") - 1,
                 0, n_vert - 1)
    xi3 = 2 * (rad - vert_range[ev]) / (vert_range[ev + 1]
                                        - vert_range[ev]) - 1

    eh = panel * n_horz * n_horz + jb * n_horz + ia
    elem = eh * n_vert + ev

    # NOTE: within an element the equiangular map is nonlinear in ξ; the
    # element nodal coordinates are warped, so interpolation in the
    # (t1, t2, r) coordinates is exact for the element's tensor basis only
    # if nodes are equiangular.  The warp preserves the tensor structure in
    # (t1, t2, r) per element (LGL nodes in ξ map monotonically), so we
    # evaluate Lagrange weights at the ξ of the *warped* nodes: since the
    # element corner angles are affine in ξ, ξ(t) is affine — exact.
    wl = [lagrange_weights(grid.xi[0], xi1),
          lagrange_weights(grid.xi[1], xi2),
          lagrange_weights(grid.xi[2], xi3)]
    interp = _TensorInterpolator(grid, elem, wl, shape)
    interp.latlon = (lats_deg, lons_deg, rads)
    return interp


def project_cubed_sphere(coords_latlon, vec_cart):
    """Rotate Cartesian vectors to (zonal, meridional, radial) at target
    points (reference project_cubed_sphere_kernel!, :1373)."""
    lat, lon = coords_latlon
    from climatemachine_tpu.common.orientations import cart_to_sphr_vec
    LAT, LON = jnp.meshgrid(jnp.deg2rad(lat), jnp.deg2rad(lon),
                            indexing="ij")
    u = jnp.stack([jnp.cos(LAT) * jnp.cos(LON),
                   jnp.cos(LAT) * jnp.sin(LON),
                   jnp.sin(LAT)], axis=-1)
    coords = u[..., None, :] * jnp.ones_like(vec_cart[..., :1])
    return cart_to_sphr_vec(coords, vec_cart)
