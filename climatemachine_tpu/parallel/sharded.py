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

from climatemachine_tpu.dg.spatial import DGModel
from climatemachine_tpu.parallel.partition import ElementPartition, partition_grid

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

    @property
    def nelem(self):
        return self.M.shape[0]


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
                            Wgrad=g.Wgrad)

        self._shard_rhs = self._build()

    def shard(self, x):
        """Place a global [E, ...] array with the element-axis sharding."""
        return jax.device_put(x, self.sharding)

    def _build(self):
        inner = self.inner
        axis = self.axis
        static = self._static
        vmapM_loc = self._vmapM_loc
        ndev = self.mesh.devices.size
        halo_kind = self.halo
        offsets = self.part.offsets
        pairs_off = self.part.pairs_off

        def shard_fn(q, aux, vmapP, send_idx, M, MI, xi_x, normals, sM,
                     face_bctag, coords, t):
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

            sgrid = _ShardGrid(vmapM=vmapM_loc, vmapP=vmapP, M=M, MI=MI,
                               xi_x=xi_x, normals=normals, sM=sM,
                               face_bctag=face_bctag, coords=coords,
                               **static)
            dg = DGModel(inner.balance_law, sgrid,
                         numerical_flux_first_order=inner.nf1,
                         numerical_flux_gradient=inner.nfg,
                         numerical_flux_second_order=inner.nf2,
                         direction=inner.direction,
                         diffusion_direction=inner.diffusion_direction,
                         update_aux=inner.update_aux,
                         exchange=exchange)
            return dg(q, aux, t)

        e = P(self.axis)
        in_specs = (e, e, e, e, e, e, e, e, e, e, e, P())
        out_specs = (e, e)
        fn = shard_map(shard_fn, mesh=self.mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)

        def rhs(q, aux, t):
            gm = self._geom
            return fn(q, aux, self._vmapP, self._send_idx, gm["M"],
                      gm["MI"], gm["xi_x"], gm["normals"], gm["sM"],
                      gm["face_bctag"], gm["coords"], t)

        return rhs

    def __call__(self, q, aux, t):
        return self._shard_rhs(q, aux, t)
