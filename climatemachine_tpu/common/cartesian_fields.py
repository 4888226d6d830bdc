"""Cartesian views of spectral-element fields on rectangular domains.

TPU-native counterpart of the reference's CartesianDomains/CartesianFields
convenience layer (``src/Common/CartesianFields/CartesianFields.jl:1-99``,
``rectangular_spectral_element_fields.jl:1-64``,
``rectangular_element.jl:91-160``): the reference sorts per-element CPU
views by a linearized corner coordinate and assembles a continuous
Cartesian array by recursively concatenating pencils/slabs with averaged
contact nodes.  Here the element ordering and node permutation are
computed ONCE host-side at construction (coordinates are concrete), and
both views are static gathers/segment-sums on device — a single XLA
``take`` for ``elements`` and one ``segment_sum`` (+ count divide) for
``assemble``, instead of O(Ne) concatenations.

Used by the ocean SuperModel (``HydrostaticBoussinesqSuperModel
.cartesian_field``) and anywhere a [E, Np] node field on a
RectangularDomain brick needs structured (x, y, z) indexing for
analysis/plotting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class SpectralElementField:
    """Cartesian view of a node field [E, Np] on a rectangular brick.

    - ``elements``: [Nex, Ney, Nez, Nqx, Nqy, Nqz] device array, indexed
      by element (i, j, k) then local node (a, b, c), with x/y/z
      monotonically increasing (reference SpectralElementField
      element_array, rectangular_spectral_element_fields.jl:36-58).
    - ``assemble()``: continuous [nx, ny, nz] Cartesian array with the
      duplicated interface nodes averaged, nx = Nex*(Nqx-1)+1 etc.
      (reference assemble, rectangular_element.jl:146-160).
    - ``x, y, z``: assembled 1-D coordinate vectors.
    """

    def __init__(self, grid, data, Ne=None):
        E, Np = int(grid.nelem), int(grid.Np)
        if data.shape[0] != E or data.shape[1] != Np or data.ndim != 2:
            raise ValueError(f"expected node field [E={E}, Np={Np}], "
                             f"got {data.shape}")
        self.grid = grid
        self.data = data
        key = ("cartesian_field_maps",) + ((tuple(Ne),) if Ne else ())
        cache = grid.__dict__.setdefault("_view_cache", {})
        if key not in cache:
            cache[key] = _build_maps(grid, Ne)
        (self.Ne, self.Nq, self._elem_order, self._node_perm,
         self._seg_ids, self._seg_counts, self.x, self.y, self.z) = cache[key]

    @property
    def elements(self):
        """[Nex, Ney, Nez, Nqx, Nqy, Nqz] structured element view."""
        d = jnp.take(self.data, self._elem_order, axis=0)
        d = jnp.take(d, self._node_perm, axis=1)
        return d.reshape(tuple(self.Ne) + tuple(self.Nq))

    def assemble(self):
        """Continuous Cartesian array, interface nodes averaged."""
        nx = [ne * (nq - 1) + 1 for ne, nq in zip(self.Ne, self.Nq)]
        total = nx[0] * nx[1] * nx[2]
        s = jax.ops.segment_sum(self.data.ravel(), self._seg_ids,
                                num_segments=total)
        return (s / self._seg_counts).reshape(nx)

    def __array__(self, dtype=None):
        out = np.asarray(self.assemble())
        return out.astype(dtype) if dtype is not None else out


def _build_maps(grid, Ne=None):
    """Host-side static maps: element (i,j,k) order, per-element node
    permutation to (a,b,c) tensor order, and the global Cartesian
    segment ids/counts for assembly."""
    coords = np.asarray(grid.coords)            # [E, Np, 3]
    E, Np = coords.shape[0], coords.shape[1]
    if coords.shape[-1] != 3:
        raise ValueError("SpectralElementField requires a 3-D brick grid")
    Nq = tuple(int(n) for n in grid.Nq)
    if len(Nq) == 2:                            # stacked 2-D storage
        raise ValueError("SpectralElementField requires a 3-D brick grid")

    # element (ix, iy, iz) from corner coordinates (reference
    # linear_coordinate sort, rectangular_spectral_element_fields.jl:4-21)
    corners = coords.min(axis=1)                # [E, 3] low corner

    def _rank(vals):
        """Rank values clustered with a relative tolerance — metric
        round-off perturbs nominally-equal coordinates, and an exact
        sort would scramble the tied axes."""
        order = np.argsort(vals)
        sv = vals[order]
        span = float(sv[-1] - sv[0]) or 1.0
        tol = span * float(np.finfo(vals.dtype).eps) ** 0.5
        cluster = np.concatenate([[0], np.cumsum(np.diff(sv) > tol)])
        ranks = np.empty(len(vals), np.int64)
        ranks[order] = cluster
        return ranks, int(cluster[-1]) + 1

    ix, nex = _rank(corners[:, 0])
    iy, ney = _rank(corners[:, 1])
    iz, nez = _rank(corners[:, 2])
    if Ne is not None and tuple(Ne) != (nex, ney, nez):
        raise ValueError(f"domain Ne {tuple(Ne)} does not match grid "
                         f"element counts {(nex, ney, nez)}")
    if nex * ney * nez != E:
        raise ValueError("grid is not a full tensor brick")
    lin = (ix * ney + iy) * nez + iz
    elem_order = np.argsort(lin).astype(np.int32)   # -> x-major (i,j,k)

    # per-element node permutation to (a, b, c) with x,y,z ascending;
    # the affine brick is a tensor product, so one element's sort is
    # every element's sort (tolerant ranks, same reason as above)
    c0 = coords[elem_order[0]]
    ra, na = _rank(c0[:, 0])
    rb, nb = _rank(c0[:, 1])
    rc, nc = _rank(c0[:, 2])
    if (na, nb, nc) != Nq:
        raise ValueError(f"element node lattice {(na, nb, nc)} does not "
                         f"match Nq {Nq}")
    node_perm = np.argsort((ra * nb + rb) * nc + rc).astype(np.int32)

    # assembly: global Cartesian node index for every (element, node)
    nqx, nqy, nqz = Nq
    nx = [n_e * (n_q - 1) + 1 for n_e, n_q in zip((nex, ney, nez), Nq)]
    a, b, c = np.meshgrid(np.arange(nqx), np.arange(nqy), np.arange(nqz),
                          indexing="ij")
    local = np.stack([a.ravel(), b.ravel(), c.ravel()], axis=-1)  # [Np,3]
    inv_perm = np.empty(Np, np.int64)
    inv_perm[node_perm] = np.arange(Np)
    gi = (ix[:, None] * (nqx - 1) + local[inv_perm][None, :, 0])
    gj = (iy[:, None] * (nqy - 1) + local[inv_perm][None, :, 1])
    gk = (iz[:, None] * (nqz - 1) + local[inv_perm][None, :, 2])
    seg = (gi * nx[1] + gj) * nx[2] + gk
    seg_ids = jnp.asarray(seg.ravel().astype(np.int32))
    counts = np.bincount(seg.ravel(), minlength=nx[0] * nx[1] * nx[2])
    seg_counts = jnp.asarray(counts.astype(coords.dtype))

    # assembled 1-D coordinates from the first pencil of elements
    def _axis_coords(dim):
        vals = coords[..., dim].ravel()
        idx = {0: gi, 1: gj, 2: gk}[dim].ravel()
        out = np.zeros(nx[dim])
        out[idx] = vals
        return out
    xs = _axis_coords(0)
    ys = _axis_coords(1)
    zs = _axis_coords(2)

    return ((nex, ney, nez), Nq, jnp.asarray(elem_order),
            jnp.asarray(node_perm), seg_ids, seg_counts, xs, ys, zs)
