"""Var-major hyperdiffusion LDG chain (grad -> div -> grad).

Performance rationale (TPU v5e, Held-Suarez p4, 12288 elems, f32):
the legacy chain builds 4-D face tensors [E, nface, Nfp, n] whose
trailing (Nfp=25, n=4..12) dims map to a (8,128) tile as (32, 128) —
13-40x lane/sublane padding on every gather and elementwise op.
Device-honest profiling (scripts/tpu_honest_profile.py) attributes
20.4 ms of the 23.6 ms chain to that face path; the volume terms are
1.9 ms.  This module keeps every tensor 2-D/3-D with the WIDE axis
last: states ride var-major [E, n, Np] (lanes = Np = 125 -> 128), face
traces ride [E, n, F] rows (lanes = F = nf_active*Nfp = 100 -> 128),
and every structural operator (derivative, face extraction, lift) is
one MXU matmul against a static [Np, *] matrix.

Replaces the per-pass scope of reference DGModel_kernels.jl:2132-2859
(volume_gradients_of_laplacians / interface kernels); the chain-level
structure matches DGModel.jl:226-310 (two extra exchanges per RHS).

Supported: single-device grids (no halo exchange hook) with identity
face orientation and uniform Nfp; anything else falls back to the
generic path in spatial.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def supports(dg) -> bool:
    g = dg.grid
    if dg.exchange is not None and not dg.row_halo:
        # sharded grids stay on the var-major chain when a face-row halo
        # is provided (parallel/sharded.py); node-space-only exchanges
        # fall back to the generic path
        return False
    if getattr(g, "face_nbr_row", None) is None and not dg.row_halo:
        return False
    if not g.face_perm_identity:
        return False
    if getattr(g, "fmask_padded", None) is None:
        return False
    # uniform face node count (isotropic Nq): SelT/LT columns assume every
    # active face carries exactly Nfp_max real nodes
    Nq = tuple(int(x) for x in g.Nq)
    return len(set(Nq)) == 1


def _tables(dg, faces, n):
    """Static numpy tables per (faces, n), cached on the DGModel.

    Cached as NUMPY (device conversion happens per trace; a jnp array
    created under one jit trace must not leak into another)."""
    cache = getattr(dg, "_vm_cache", None)
    if cache is None:
        cache = dg._vm_cache = {}
    key = (faces, n)
    tab = cache.get(key)
    if tab is not None:
        return tab

    g = dg.grid
    Np, Nfp, nface = g.Np, g.Nfp_max, g.nface
    E = g.nelem
    nfa = len(faces)
    F = nfa * Nfp
    fmask = np.asarray(g.fmask_padded)
    dt = np.float32 if jnp.asarray(g.sM).dtype == jnp.float32 else np.float64

    # face-node selection: SelT [Np, F]; column (f, k) pulls volume node
    # fmask[faces[f], k]
    SelT = np.zeros((Np, F), dtype=dt)
    for j, f in enumerate(faces):
        for k in range(Nfp):
            SelT[fmask[f, k], j * Nfp + k] = 1.0
    # lift transpose: LT [F, Np] = lift[:, active cols]^T (0/1 scatter)
    lift = np.asarray(g.lift)
    cols = np.concatenate([np.arange(f * Nfp, (f + 1) * Nfp) for f in faces])
    LT = lift[:, cols].T.astype(dt)

    # neighbor row ids in ACTIVE-face row space: row (e, j) -> neighbor's
    # active row.  Requires neighbors of active faces to be active faces
    # (true: horizontal pairs with horizontal on stacked topologies).
    # Sharded grids carry no local face_nbr_row; the neighbor map lives
    # in the RowHalo instead (nbr_active=None).
    if getattr(g, "face_nbr_row", None) is None:
        nbr_active = None
    else:
        nbr_row = np.asarray(g.face_nbr_row).reshape(E, nface)
        pos = -np.ones(nface, dtype=np.int64)
        for j, f in enumerate(faces):
            pos[f] = j
        ne = nbr_row[:, list(faces)] // nface
        nf = nbr_row[:, list(faces)] % nface
        if (pos[nf] < 0).any():
            cache[key] = None
            return None
        nbr_active = (ne * nfa + pos[nf]).astype(np.int32).reshape(-1)

    bctag = np.asarray(g.face_bctag)[:, list(faces)]      # [E, nfa]
    sign = np.where(bctag != 0, 1.0, -1.0).astype(dt)     # [E, nfa]

    tab = dict(SelT=SelT, LT=LT, nbr_active=nbr_active,
               sign=np.repeat(sign, Nfp, axis=1),          # [E, F]
               F=F, nfa=nfa)
    cache[key] = tab
    return tab


def _geom(dg, faces, dims):
    """Var-major geometry arrays (built from device grid arrays per
    trace; XLA constant-folds them when the grid is concrete)."""
    g = dg.grid
    E, Np, Nfp = g.nelem, g.Np, g.Nfp_max
    fl = list(faces)
    sM = g.sM[:, fl, :].reshape(E, 1, -1)                 # [E, 1, F]
    nrm = g.normals[:, fl, :, :]                          # [E, nfa, Nfp, 3]
    nrm = nrm.transpose(0, 3, 1, 2).reshape(E, 3, -1)     # [E, 3, F]
    xi = g.xi_x[:, :, list(dims), :]                      # [E, Np, nd, 3]
    xi = xi.transpose(0, 2, 3, 1)                         # [E, nd, 3, Np]
    MI = g.MI[:, None, :]                                 # [E, 1, Np]
    return sM, nrm, xi, MI


def _rows_to_R2(rows, E, n, nfa, Nfp):
    """[E, n, F] -> [E*nfa, n*Nfp] gather rows."""
    return (rows.reshape(E, n, nfa, Nfp).transpose(0, 2, 1, 3)
            .reshape(E * nfa, n * Nfp))


def _R2_to_rows(R2, E, n, nfa, Nfp):
    return (R2.reshape(E, nfa, n, Nfp).transpose(0, 2, 1, 3)
            .reshape(E, n, nfa * Nfp))


def _W_for(dg, dims):
    g = dg.grid
    if len(dims) == g.dim:
        return g.Wgrad
    return jnp.concatenate(
        [g.Wgrad[a * g.Np:(a + 1) * g.Np, :] for a in dims], axis=0)


def _Wcat_for(dg, tab, dims):
    """Fused [Np, nd*Np + F] operator: derivative (Wgrad^T) and face
    extraction (SelT) in ONE matmul, so each pass reads its state from
    HBM once instead of twice.  Built from device grid arrays per trace
    (constant-folded when the grid is concrete)."""
    W = _W_for(dg, dims)                                   # [nd*Np, Np]
    return jnp.concatenate([W.T, jnp.asarray(tab["SelT"])], axis=1)


def _exchange(rows, tab, E, n, nfa, Nfp, halo=None):
    """Neighbor face values: [E, n, F] -> [E, n, F].  With ``halo``
    (sharded runs) the rows ride the face-row collective and the
    neighbor map indexes the extended row space."""
    R2 = _rows_to_R2(rows, E, n, nfa, Nfp)
    if halo is not None:
        nbr = halo.gather(R2)
    else:
        nbr = R2[jnp.asarray(tab["nbr_active"])]
    return _R2_to_rows(nbr, E, n, nfa, Nfp)


def grad_vm(dg, xv, tab, geom, dims, halo=None):
    """Var-major DG gradient: xv [E, n, Np] -> [E, 3, n, Np]."""
    g = dg.grid
    E, n, Np = xv.shape
    nd = len(dims)
    Nfp = g.Nfp_max
    nfa, F = tab["nfa"], tab["F"]
    sM, nrm, xi, MI = geom

    Wcat = _Wcat_for(dg, tab, dims)                        # [Np, nd*Np+F]
    xr = xv.reshape(E * n, Np)
    cat = jnp.matmul(xr, Wcat, precision=_HI)
    d = cat[:, :nd * Np].reshape(E, n, nd, Np)
    rowsM = cat[:, nd * Np:].reshape(E, n, F)
    rowsP = _exchange(rowsM, tab, E, n, nfa, Nfp, halo)
    dj = 0.5 * (rowsP - rowsM)                             # [E, n, F]

    LT = jnp.asarray(tab["LT"])
    # all 3 components' face corrections ride ONE [E*3n, F] @ [F, Np]
    w3 = sM * nrm                                          # [E, 3, F]
    prod = w3[:, :, None, :] * dj[:, None, :, :]           # [E, 3, n, F]
    corr = jnp.matmul(prod.reshape(E * 3 * n, F), LT,
                      precision=_HI).reshape(E, 3, n, Np)
    out = []
    for c in range(3):
        vol = 0.0
        for ai, a in enumerate(dims):
            vol = vol + xi[:, ai, c][:, None, :] * d[:, :, ai, :]
        out.append(vol + MI * corr[:, c])
    return jnp.stack(out, axis=1)                          # [E, 3, n, Np]


def div_vm(dg, vv, tab, geom, dims, halo=None):
    """Var-major DG divergence: vv [E, 3, n, Np] -> [E, n, Np] (scalar
    n·v face exchange: only an n-wide row rides the gather)."""
    g = dg.grid
    E, _, n, Np = vv.shape
    nd = len(dims)
    Nfp = g.Nfp_max
    nfa, F = tab["nfa"], tab["F"]
    sM, nrm, xi, MI = geom

    Wcat = _Wcat_for(dg, tab, dims)                        # [Np, nd*Np+F]
    vr = vv.reshape(E * 3 * n, Np)
    cat = jnp.matmul(vr, Wcat, precision=_HI)
    dv = cat[:, :nd * Np].reshape(E, 3, n, nd, Np)
    div = 0.0
    for ai, a in enumerate(dims):
        for c in range(3):
            div = div + xi[:, ai, c][:, None, :] * dv[:, c, :, ai, :]

    rows3 = cat[:, nd * Np:].reshape(E, 3, n, F)
    s = jnp.sum(nrm[:, :, None, :] * rows3, axis=1)        # [E, n, F]
    sP = _exchange(s, tab, E, n, nfa, Nfp, halo)
    sign = jnp.asarray(tab["sign"])[:, None, :]            # [E, 1, F]
    dj = 0.5 * (sign * sP - s)

    LT = jnp.asarray(tab["LT"])
    corr = jnp.matmul((sM * dj).reshape(E * n, F), LT,
                      precision=_HI).reshape(E, n, Np)
    return div + MI * corr


def hyper_chain(dg, q, aux, t, direction):
    """Full var-major chain; returns the node-major [E, Np, 3, n] hyper
    state expected by transform_post_gradient_laplacian."""
    from climatemachine_tpu.dg.spatial import (direction_dims,
                                               direction_faces)
    bl, g = dg.balance_law, dg.grid
    dims = direction_dims(direction, g.dim)
    faces = direction_faces(direction, g.dim)

    gl = bl.compute_gradient_laplacian_argument(q, aux, t)  # [E, Np, n]
    n = gl.shape[-1]
    halo = dg.row_halo.get(faces)
    if dg.exchange is not None and halo is None:
        return None
    tab = _tables(dg, faces, n)
    if tab is None:
        return None
    geom = _geom(dg, faces, dims)

    xv = gl.transpose(0, 2, 1)                              # [E, n, Np]
    grad = grad_vm(dg, xv, tab, geom, dims, halo)           # [E, 3, n, Np]
    lap = div_vm(dg, grad, tab, geom, dims, halo)           # [E, n, Np]
    grad_lap = grad_vm(dg, lap, tab, geom, dims, halo)      # [E, 3, n, Np]
    out = grad_lap.transpose(0, 3, 1, 2)                    # [E, Np, 3, n]
    return bl.transform_post_gradient_laplacian(out, q, aux, t)


def scalar_hyper_correction(dg, F2, faces):
    """Var-major hyper-only second-order interface term (same math as
    DGModel._scalar_hyper_correction, reference
    dgsem_interface_tendency! second-order part for hyper-only configs):
    each side contracts its volume F₂ with its OWN outward normal, the
    neighbor's value enters as −s⁺, and the correction is masked to
    interior faces.  Everything rides [E, nq, F] tiles + two MXU
    matmuls — no [E·nface, Nfp·ncd·n] lane-expanded rows.

    Returns the signed tendency contribution [E, Np, nq], or None when
    the tables don't support this face set."""
    from climatemachine_tpu.dg.spatial import direction_dims
    g = dg.grid
    E, Np, Nfp = g.nelem, g.Np, g.Nfp_max
    nq = F2.shape[-1]
    halo = dg.row_halo.get(tuple(faces))
    if dg.exchange is not None and halo is None:
        return None
    tab = _tables(dg, faces, nq)
    if tab is None:
        return None
    nfa, F = tab["nfa"], tab["F"]
    # geometry for the ACTIVE face set (dims unused here; pass full)
    sM, nrm, _, _ = _geom(dg, faces, direction_dims("every", g.dim))

    SelT = jnp.asarray(tab["SelT"])
    Fv = F2.transpose(0, 2, 3, 1).reshape(E * 3 * nq, Np)  # [E·3·nq, Np]
    rows3 = jnp.matmul(Fv, SelT, precision=_HI).reshape(E, 3, nq, F)
    s = jnp.sum(nrm[:, :, None, :] * rows3, axis=1)        # [E, nq, F]
    sP = _exchange(s, tab, E, nq, nfa, Nfp, halo)
    interior = (jnp.asarray(tab["sign"]) < 0)[:, None, :]  # [E, 1, F]
    d2 = jnp.where(interior, 0.5 * (s - sP), 0.0)

    LT = jnp.asarray(tab["LT"])
    corr = jnp.matmul((sM * d2).reshape(E * nq, F), LT,
                      precision=_HI).reshape(E, nq, Np)
    return -(g.MI[:, None, :] * corr).transpose(0, 2, 1)
