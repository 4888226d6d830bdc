"""shard_map'ed DG operator over a device mesh.

TPU-native replacement for the reference's MPIStateArray halo machinery
(``src/Arrays/MPIStateArrays.jl:411-516`` begin/end_ghost_exchange! with
Isend/Irecv + pack/unpack kernels) and the comm/compute-overlapped RHS
(``src/Numerics/DGMethods/DGModel.jl:85-427``):

- State lives as a global jax.Array sharded over the element axis of a
  1-D ``Mesh(('e',))`` (columns never split — partition.py).
- Inside ``shard_map`` the halo (default ``halo='ppermute'``) is: pack
  per-neighbor export face-nodes → one ``lax.ppermute`` per shard-ring
  offset with traffic → concat as an extended node space the per-shard
  ``vmapP`` indexes.  Each permute moves only what that neighbor
  distance needs and rides a point-to-point ICI hop; ``halo='allgather'``
  keeps the simpler one-collective variant (every shard's full export
  list to everyone) for comparison.  XLA schedules the collectives
  asynchronously against the volume einsums, recovering the reference's
  comm/compute overlap without explicit double buffering.
- Global reductions (norm/dt/conservation) are jnp reductions of the
  sharded array — GSPMD inserts the psum (reference MPI.Allreduce).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from climatemachine_tpu.dg.spatial import DGModel, direction_faces
from climatemachine_tpu.parallel.partition import (ElementPartition,
                                                   partition_grid,
                                                   partition_rows)

AXIS = "e"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_multihost(devices=None, axes=("dcn", "ici")) -> Mesh:
    """2-D (hosts × chips-per-host) mesh for multi-host runs.

    The element ring is laid out host-major, so the block partition's
    ±1 ring neighbors are intra-host (ICI) everywhere except at host
    boundaries — cross-DCN halo traffic is one face row per host pair
    per offset (SURVEY §2.13 DCN layout)."""
    devices = list(devices if devices is not None else jax.devices())
    hosts = {}
    for d in devices:
        hosts.setdefault(getattr(d, "process_index", 0), []).append(d)
    per = min(len(v) for v in hosts.values())
    grid = np.asarray([v[:per] for _, v in sorted(hosts.items())])
    return Mesh(grid, axes)


@dataclass
class _ShardGrid:
    """Per-shard grid view with the attrs the DG hot path reads."""
    dim: int
    Nq: Tuple[int, ...]
    Np: int
    nface: int
    Nfp_max: int
    D: Tuple
    M: jnp.ndarray
    MI: jnp.ndarray
    xi_x: jnp.ndarray
    normals: jnp.ndarray
    sM: jnp.ndarray
    vmapM: jnp.ndarray
    vmapP: jnp.ndarray
    face_bctag: jnp.ndarray
    elem_bctags: Tuple[int, ...]
    lift: jnp.ndarray
    coords: jnp.ndarray
    face_nbr_row: object = None   # None => node-space gather path
    Wdiv: object = None
    Wgrad: object = None
    fmask_padded: object = None
    face_perm_identity: bool = True

    @property
    def nelem(self):
        return self.M.shape[0]


class _RowHalo:
    """Face-row halo for the var-major fast paths under shard_map.

    ``gather(R2)`` returns, for every local active face row of
    ``R2 [E_loc*nfa, W]``, the neighbor's row: local rows by index,
    remote rows through one collective per ring offset (ppermute) or a
    single all_gather (CPU validation rig) — the row-space analog of the
    node halo (reference begin/end_ghost_exchange!,
    MPIStateArrays.jl:411-516)."""

    def __init__(self, nbr, send, offsets, pairs, axis, ndev, kind,
                 max_rows):
        self.nbr = nbr            # [E_loc*nfa] extended-space neighbor ids
        self.send = send          # [n_off, max_rows] local rows to export
        self.offsets = offsets
        self.pairs = pairs
        self.axis = axis
        self.ndev = ndev
        self.kind = kind
        self.max_rows = max_rows

    def _shard_index(self):
        axes = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        idx = 0
        for a in axes:
            idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
        return idx

    def gather(self, R2):
        parts = [R2]
        if self.kind == "ppermute":
            prev = None
            for oi, o in enumerate(self.offsets):
                snd = R2[self.send[oi]]
                if prev is not None:
                    # chain collectives (see node halo note: XLA:CPU's
                    # rendezvous can deadlock on reordered permutes)
                    snd, _ = jax.lax.optimization_barrier((snd, prev))
                perm = [(d, (d + o) % self.ndev) for d in self.pairs[oi]]
                prev = jax.lax.ppermute(snd, self.axis, perm)
                parts.append(prev)
        else:
            snd = R2[self.send.reshape(-1)]          # [n_off*max, W]
            gathered = jax.lax.all_gather(snd, self.axis)
            gathered = gathered.reshape((self.ndev,) + snd.shape)
            s = self._shard_index()
            m = self.max_rows
            for oi, o in enumerate(self.offsets):
                src = (s - o) % self.ndev
                blk = jnp.take(gathered, src, axis=0)
                parts.append(blk[oi * m:(oi + 1) * m])
        ext = jnp.concatenate(parts, axis=0)
        return ext[self.nbr]


class ShardedDGModel:
    """Wraps a single-device :class:`DGModel` into a shard_map'd RHS.

    ``rhs(q, aux, t)`` has the same signature/semantics as ``DGModel()``
    but q/aux are global arrays sharded over ``mesh`` axis 'e'.
    """

    def __init__(self, dg: DGModel, mesh: Mesh, halo: str = "auto"):
        """halo: 'ppermute' (per-neighbor exchange, minimal traffic),
        'allgather' (one collective, every shard's exports to everyone),
        or 'auto' = ppermute on TPU, allgather on CPU.  XLA:CPU's
        collective rendezvous can starve under deep async launch queues
        (hundreds of un-synced steps) when a program issues several
        point-to-point permutes; the CPU mesh is a validation rig, so it
        defaults to the single-collective variant."""
        if halo == "auto":
            halo = ("ppermute" if jax.default_backend() == "tpu"
                    else "allgather")
        self.inner = dg
        self.mesh = mesh
        # multi-axis meshes (e.g. ('dcn', 'ici')) shard the element axis
        # over the row-major flattened device grid; collectives address
        # the product axis by the tuple of names
        self.axis = (mesh.axis_names[0] if len(mesh.axis_names) == 1
                     else tuple(mesh.axis_names))
        self.halo = halo
        ndev = mesh.devices.size
        g = dg.grid
        self.part = partition_grid(g, ndev)
        p = self.part

        self.sharding = NamedSharding(mesh, P(self.axis))
        # stacked per-shard index maps, sharded so each device gets its own
        if halo == "ppermute":
            vmapP_np, send_np = p.vmapP_perm, p.send_idx_off.transpose(1, 0, 2)
        else:
            vmapP_np, send_np = p.vmapP_loc, p.send_idx
        self._vmapP = jax.device_put(
            jnp.asarray(vmapP_np, dtype=jnp.int32), self.sharding)
        self._send_idx = jax.device_put(
            jnp.asarray(send_np, dtype=jnp.int32), self.sharding)
        self._vmapM_loc = jnp.asarray(p.vmapM_loc, dtype=jnp.int32)

        # element-sharded geometry
        shard_e = lambda a: jax.device_put(a, self.sharding)
        self._geom = dict(
            M=shard_e(g.M), MI=shard_e(g.MI), xi_x=shard_e(g.xi_x),
            normals=shard_e(g.normals), sM=shard_e(g.sM),
            face_bctag=shard_e(g.face_bctag), coords=shard_e(g.coords))
        self._static = dict(dim=g.dim, Nq=g.Nq, Np=g.Np, nface=g.nface,
                            Nfp_max=g.Nfp_max, D=g.D, lift=g.lift,
                            elem_bctags=g.elem_bctags, Wdiv=g.Wdiv,
                            Wgrad=g.Wgrad,
                            fmask_padded=g.fmask_padded,
                            face_perm_identity=g.face_perm_identity)

        # --- face-ROW halo for the var-major fast paths --------------------
        # Only when the per-shard boundary pattern is shard-invariant
        # (stacked grids: tags depend on the vertical position only), so
        # the static kernel tables are valid under the single SPMD trace.
        self._row_parts = {}
        self._bctag_static = None
        if (g.face_nbr_row is not None and g.face_perm_identity
                and g.n_vert is not None):
            bct = np.asarray(g.face_bctag).reshape(ndev, p.E_loc, g.nface)
            if (bct == bct[0]).all():
                self._bctag_static = bct[0]
                face_sets = {tuple(range(g.nface))}
                bl = dg.balance_law
                from climatemachine_tpu.balance_laws import state_types as st
                if bl.num_state(st.Hyperdiffusive()) > 0:
                    hdir = (getattr(bl, "hyperdiffusion_direction", None)
                            or dg.diffusion_direction)
                    face_sets.add(direction_faces(hdir, g.dim))
                for fs in face_sets:
                    try:
                        self._row_parts[fs] = partition_rows(g, ndev, fs)
                    except ValueError:
                        pass
        self._row_tabs = {
            fs: dict(nbr=jax.device_put(jnp.asarray(rp.nbr_ext, jnp.int32),
                                        self.sharding),
                     send=jax.device_put(
                         jnp.asarray(rp.send_rows.transpose(1, 0, 2),
                                     jnp.int32), self.sharding))
            for fs, rp in self._row_parts.items()}

        self._shard_rhs = self._build()

    def shard(self, x):
        """Place a global [E, ...] array with the element-axis sharding."""
        return jax.device_put(x, self.sharding)

    # --- facade so solver-type strategies (driver/solver_types.py) can
    # assemble IMEX/multirate stacks from a sharded model exactly like a
    # local one: the wrapped model's balance law / grid / fluxes are the
    # GLOBAL objects, and sub-models built from them are re-wrapped with
    # the same mesh by the strategy.
    @property
    def balance_law(self):
        return self.inner.balance_law

    @property
    def grid(self):
        return self.inner.grid

    @property
    def nf1(self):
        return self.inner.nf1

    @property
    def direction(self):
        return self.inner.direction

    @property
    def remainder(self):
        return self.inner.remainder

    def pre_stage(self, q, aux, t):
        return self.inner.pre_stage(q, aux, t)

    def _build(self):
        inner = self.inner
        axis = self.axis
        static = self._static
        vmapM_loc = self._vmapM_loc
        ndev = self.mesh.devices.size
        halo_kind = self.halo
        offsets = self.part.offsets
        pairs_off = self.part.pairs_off
        row_parts = self._row_parts
        bctag_static = self._bctag_static

        def shard_fn(q, aux, vmapP, send_idx, M, MI, xi_x, normals, sM,
                     face_bctag, coords, row_tabs, t):
            vmapP = vmapP[0]        # [E_loc, nface, Nfpm] (leading dev axis)
            send_idx = send_idx[0]

            def exchange(flat):
                # pack exported face nodes, move them, append as the halo
                # tail of the extended node space (reference
                # begin/end_ghost_exchange!, MPIStateArrays.jl:411-516)
                if halo_kind == "ppermute":
                    parts = [flat]
                    prev = None
                    for oi, o in enumerate(offsets):
                        send = flat[send_idx[oi]]           # [max_off, n]
                        if prev is not None:
                            # chain the permutes: XLA:CPU's thunk executor
                            # may start independent collectives in
                            # different orders on different shards and
                            # deadlock the rendezvous; TPU serializes
                            # collectives by channel anyway.
                            send, _ = jax.lax.optimization_barrier(
                                (send, prev))
                        perm = [(d, (d + o) % ndev) for d in pairs_off[oi]]
                        prev = jax.lax.ppermute(send, axis, perm)
                        parts.append(prev)
                    return jnp.concatenate(parts, axis=0)
                send = flat[send_idx]                       # [max_send, n]
                halo = jax.lax.all_gather(send, axis)       # [ndev, ms, n]
                halo = halo.reshape((-1,) + flat.shape[1:])
                return jnp.concatenate([flat, halo], axis=0)

            # face-row halos for the var-major fast paths (static
            # boundary tables require the np shard-invariant bctag)
            row_halo = {}
            for fs, tabs in row_tabs.items():
                rp = row_parts[fs]
                row_halo[fs] = _RowHalo(
                    nbr=tabs["nbr"][0], send=tabs["send"][0],
                    offsets=rp.offsets, pairs=rp.pairs_off, axis=axis,
                    ndev=ndev, kind=halo_kind, max_rows=rp.max_rows_off)

            sgrid = _ShardGrid(vmapM=vmapM_loc, vmapP=vmapP, M=M, MI=MI,
                               xi_x=xi_x, normals=normals, sM=sM,
                               face_bctag=(bctag_static
                                           if bctag_static is not None
                                           else face_bctag),
                               coords=coords, **static)
            dg = DGModel(inner.balance_law, sgrid,
                         numerical_flux_first_order=inner.nf1,
                         numerical_flux_gradient=inner.nfg,
                         numerical_flux_second_order=inner.nf2,
                         direction=inner.direction,
                         diffusion_direction=inner.diffusion_direction,
                         update_aux=inner.update_aux,
                         exchange=exchange,
                         remainder=inner.remainder,
                         row_halo=row_halo,
                         **inner.kernel_opts)
            return dg(q, aux, t)

        e = P(self.axis)
        in_specs = (e, e, e, e, e, e, e, e, e, e, e, e, P())
        out_specs = (e, e)
        fn = shard_map(shard_fn, mesh=self.mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)

        def rhs(q, aux, t):
            gm = self._geom
            return fn(q, aux, self._vmapP, self._send_idx, gm["M"],
                      gm["MI"], gm["xi_x"], gm["normals"], gm["sM"],
                      gm["face_bctag"], gm["coords"], self._row_tabs, t)

        return rhs

    def __call__(self, q, aux, t):
        return self._shard_rhs(q, aux, t)
