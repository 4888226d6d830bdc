"""Element-axis partition + halo index maps for multi-device runs.

TPU-native replacement for the reference's MPI domain decomposition
(Hilbert-SFC partition in ``src/Numerics/Mesh/BrickMesh.jl:40-428``, ghost
layer via ``connectmesh``, comm maps ``vmapsend/vmaprecv`` in
``src/Numerics/Mesh/Grids.jl:761``):

- The global topology orders stacked elements column-major
  (e = eh*n_vert + ev), so a **contiguous block partition of the element
  axis** keeps every vertical column on one device (the reference's
  column-on-rank invariant) — no space-filling curve needed when the
  partition is block-structured by construction (SURVEY §7 design map).
- Instead of ghost *elements*, each shard imports exactly the remote
  face *nodes* its ``vmapP`` references: the export list per shard is
  precomputed host-side; at runtime the halo is one gather + one
  ``all_gather`` (or neighbor ``ppermute``) + index remap.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ElementPartition:
    """Static partition data (host numpy; uploaded by the sharded model).

    Attributes:
      ndev: number of shards.
      E_loc: elements per shard.
      max_send: padded per-shard export count (face nodes).
      send_idx: [ndev, max_send] local flat node index each shard packs.
      vmapP_loc: [ndev, E_loc, nface, Nfp_max] per-shard face-neighbor map
        into the extended node space [E_loc*Np + ndev*max_send].
      vmapM_loc: [E_loc, nface, Nfp_max] local minus-side map (same for all
        shards).
    """
    ndev: int
    E_loc: int
    Np: int
    max_send: int
    send_idx: np.ndarray
    vmapP_loc: np.ndarray
    vmapM_loc: np.ndarray


def partition_grid(grid, ndev: int) -> ElementPartition:
    """Block-partition the element axis of a built grid into ndev shards.

    Requires E % ndev == 0 and, for stacked topologies, that shard
    boundaries align with whole columns (E_loc % n_vert == 0).
    """
    E, Np = grid.nelem, grid.Np
    nface, Nfpm = grid.nface, grid.Nfp_max
    if E % ndev:
        raise ValueError(f"nelem={E} not divisible by ndev={ndev}")
    E_loc = E // ndev
    if grid.n_vert is not None and E_loc % grid.n_vert:
        raise ValueError(
            f"shard size {E_loc} splits vertical columns (n_vert="
            f"{grid.n_vert}); choose ndev dividing n_horz")

    vmapP = np.asarray(grid.vmapP, dtype=np.int64)   # [E, nface, Nfpm] global
    vmapM = np.asarray(grid.vmapM, dtype=np.int64)
    ref_elem = vmapP // Np
    ref_owner = ref_elem // E_loc                    # owner shard of target
    src_owner = (np.arange(E) // E_loc)[:, None, None]

    # export list per shard: global node ids referenced from other shards
    exports = []
    for d in range(ndev):
        mask = (ref_owner == d) & (src_owner != d)
        exports.append(np.unique(vmapP[mask]))
    max_send = max((len(x) for x in exports), default=0)
    max_send = max(max_send, 1)

    send_idx = np.zeros((ndev, max_send), dtype=np.int64)
    for d, ex in enumerate(exports):
        send_idx[d, :len(ex)] = ex - d * E_loc * Np   # local flat index
        if len(ex) < max_send:
            send_idx[d, len(ex):] = 0

    # remap vmapP per shard
    vmapP_loc = np.zeros((ndev, E_loc, nface, Nfpm), dtype=np.int64)
    halo_base = E_loc * Np
    for s in range(ndev):
        blk = vmapP[s * E_loc:(s + 1) * E_loc]        # global indices
        own = ref_owner[s * E_loc:(s + 1) * E_loc]
        local = blk - s * E_loc * Np
        remote = np.zeros_like(blk)
        for d in range(ndev):
            if d == s or len(exports[d]) == 0:
                continue
            m = own == d
            if not m.any():
                continue
            pos = np.searchsorted(exports[d], blk[m])
            remote[m] = halo_base + d * max_send + pos
        vmapP_loc[s] = np.where(own == s, local, remote)

    # vmapM[e] = e*Np + fmask is the same local pattern on every shard, so
    # the first block already is the local minus-side map.
    vmapM_loc = vmapM[:E_loc]

    return ElementPartition(ndev=ndev, E_loc=E_loc, Np=Np,
                            max_send=max_send, send_idx=send_idx,
                            vmapP_loc=vmapP_loc, vmapM_loc=vmapM_loc)
