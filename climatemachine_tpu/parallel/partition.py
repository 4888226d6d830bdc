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
      send_idx: [ndev, max_send] local flat node index each shard packs
        (all-gather halo).
      vmapP_loc: [ndev, E_loc, nface, Nfp_max] per-shard face-neighbor map
        into the extended node space [E_loc*Np + ndev*max_send]
        (all-gather halo).
      vmapM_loc: [E_loc, nface, Nfp_max] local minus-side map (same for all
        shards).
      offsets: shard-offset ring distances (dst−src mod ndev) with any
        traffic — the neighbor set of the ppermute halo.
      max_send_off: padded per-(offset, shard) export count.
      send_idx_off: [n_off, ndev, max_send_off] local flat node index shard
        d packs for neighbor (d+offsets[oi]) % ndev.
      vmapP_perm: [ndev, E_loc, nface, Nfp_max] face-neighbor map into the
        ppermute extended node space [E_loc*Np + n_off*max_send_off].
    """
    ndev: int
    E_loc: int
    Np: int
    max_send: int
    send_idx: np.ndarray
    vmapP_loc: np.ndarray
    vmapM_loc: np.ndarray
    offsets: tuple = ()
    max_send_off: int = 0
    send_idx_off: np.ndarray = None
    vmapP_perm: np.ndarray = None
    pairs_off: tuple = ()   # per offset: source shards with traffic


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

    # ---- neighbor (ppermute) halo: per-ordered-pair export lists --------
    # pair (d → s): nodes owned by d that shard s references.  Traffic is
    # grouped by ring offset o = (s − d) mod ndev; one ppermute per offset
    # moves only what that neighbor distance actually needs (the
    # all-gather halo ships every shard's full export list to everyone).
    pair_exports = {}
    for s in range(ndev):
        blk = vmapP[s * E_loc:(s + 1) * E_loc]
        own = ref_owner[s * E_loc:(s + 1) * E_loc]
        for d in np.unique(own):
            if d == s:
                continue
            pair_exports[(int(d), s)] = np.unique(blk[own == d])
    offsets = tuple(sorted({(s - d) % ndev for d, s in pair_exports}))
    n_off = len(offsets)
    max_send_off = max((len(v) for v in pair_exports.values()), default=0)
    max_send_off = max(max_send_off, 1)
    send_idx_off = np.zeros((max(n_off, 1), ndev, max_send_off),
                            dtype=np.int64)
    for (d, s), ex in pair_exports.items():
        oi = offsets.index((s - d) % ndev)
        send_idx_off[oi, d, :len(ex)] = ex - d * E_loc * Np
    vmapP_perm = np.zeros((ndev, E_loc, nface, Nfpm), dtype=np.int64)
    for s in range(ndev):
        blk = vmapP[s * E_loc:(s + 1) * E_loc]
        own = ref_owner[s * E_loc:(s + 1) * E_loc]
        local = blk - s * E_loc * Np
        remote = np.zeros_like(blk)
        for d in np.unique(own):
            if d == s:
                continue
            ex = pair_exports[(int(d), s)]
            oi = offsets.index((s - int(d)) % ndev)
            m = own == d
            pos = np.searchsorted(ex, blk[m])
            remote[m] = halo_base + oi * max_send_off + pos
        vmapP_perm[s] = np.where(own == s, local, remote)

    pairs_off = tuple(
        tuple(sorted(d for (d, s) in pair_exports
                     if (s - d) % ndev == o))
        for o in offsets)

    return ElementPartition(ndev=ndev, E_loc=E_loc, Np=Np,
                            max_send=max_send, send_idx=send_idx,
                            vmapP_loc=vmapP_loc, vmapM_loc=vmapM_loc,
                            offsets=offsets, max_send_off=max_send_off,
                            send_idx_off=send_idx_off,
                            vmapP_perm=vmapP_perm, pairs_off=pairs_off)


@dataclass
class RowPartition:
    """Face-ROW-space halo maps for the var-major fast paths.

    The var-major surface pass and LDG chain exchange whole face rows
    ([.., row_width] gather-ready tiles) instead of individual nodes; the
    export lists are therefore row ids in the ACTIVE-face row space
    ``r = e_loc*nfa + pos(face)``.  On stacked column-aligned partitions
    only horizontal faces ever cross shards, so any active face set that
    contains the horizontal faces is exchange-complete.

    Attributes:
      nbr_ext: [ndev, E_loc*nfa] int32 — neighbor row id in the extended
        active-row space [E_loc*nfa + n_off*max_rows_off].
      offsets: ring distances with traffic (subset of the node halo's).
      send_rows: [n_off, ndev, max_rows_off] active-row ids shard d packs
        for neighbor (d+offsets[oi]) %% ndev.
      pairs_off: per offset, source shards with traffic.
    """
    ndev: int
    E_loc: int
    nfa: int
    nbr_ext: np.ndarray
    offsets: tuple
    max_rows_off: int
    send_rows: np.ndarray
    pairs_off: tuple


def partition_rows(grid, ndev: int, faces) -> "RowPartition":
    """Row-space halo for the active face set ``faces`` (ordered tuple).

    Requires every remote neighbor of an active face to be an active
    face itself (true whenever faces ⊇ horizontal faces on stacked
    column-aligned partitions); raises otherwise.
    """
    E, nface = grid.nelem, grid.nface
    if E % ndev:
        raise ValueError(f"nelem={E} not divisible by ndev={ndev}")
    E_loc = E // ndev
    faces = tuple(faces)
    nfa = len(faces)
    pos = -np.ones(nface, dtype=np.int64)
    for j, f in enumerate(faces):
        pos[f] = j

    nbr = np.asarray(grid.face_nbr_row)[:, list(faces)]  # [E, nfa] global
    ne, nf = nbr // nface, nbr % nface
    owner = ne // E_loc
    src_owner = (np.arange(E) // E_loc)[:, None]
    remote = owner != src_owner
    if (pos[nf][remote] < 0).any():
        raise ValueError("remote neighbor face outside the active set")

    # global active-row id of the neighbor
    g_active = ne * nfa + pos[nf]                        # [E, nfa]

    # per ordered pair (d -> s): exported active rows owned by d
    pair_exports = {}
    for s in range(ndev):
        own = owner[s * E_loc:(s + 1) * E_loc]
        tgt = g_active[s * E_loc:(s + 1) * E_loc]
        for d in np.unique(own):
            if d == s:
                continue
            pair_exports[(int(d), s)] = np.unique(tgt[own == d])
    offsets = tuple(sorted({(s - d) % ndev for d, s in pair_exports}))
    n_off = len(offsets)
    max_rows_off = max((len(v) for v in pair_exports.values()), default=0)
    max_rows_off = max(max_rows_off, 1)
    send_rows = np.zeros((max(n_off, 1), ndev, max_rows_off), dtype=np.int64)
    for (d, s), ex in pair_exports.items():
        oi = offsets.index((s - d) % ndev)
        send_rows[oi, d, :len(ex)] = ex - d * E_loc * nfa  # local active row

    halo_base = E_loc * nfa
    nbr_ext = np.zeros((ndev, E_loc * nfa), dtype=np.int64)
    for s in range(ndev):
        own = owner[s * E_loc:(s + 1) * E_loc]
        tgt = g_active[s * E_loc:(s + 1) * E_loc]
        local = tgt - s * E_loc * nfa
        remote_ids = np.zeros_like(tgt)
        for d in np.unique(own):
            if d == s:
                continue
            ex = pair_exports[(int(d), s)]
            oi = offsets.index((s - int(d)) % ndev)
            m = own == d
            idx = np.searchsorted(ex, tgt[m])
            remote_ids[m] = halo_base + oi * max_rows_off + idx
        nbr_ext[s] = np.where(own == s, local, remote_ids).reshape(-1)

    pairs_off = tuple(
        tuple(sorted(d for (d, s) in pair_exports if (s - d) % ndev == o))
        for o in offsets)
    return RowPartition(ndev=ndev, E_loc=E_loc, nfa=nfa, nbr_ext=nbr_ext,
                        offsets=offsets, max_rows_off=max_rows_off,
                        send_rows=send_rows, pairs_off=pairs_off)
