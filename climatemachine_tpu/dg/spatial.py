"""DG spatial discretization: the RHS operator (the hot path).

Scope of reference ``src/Numerics/DGMethods/``: DGModel.jl (:85 RHS
functor), DGModel_kernels.jl (volume_tendency! :64, dgsem_interface_tendency!
:588, volume_gradients! :934, dgsem_interface_gradients! :1365),
SpaceDiscretization.jl (launch logic :1090-1212).

TPU-first design (contrast with the reference's KernelAbstractions kernels):

- **Volume terms are batched tensor contractions.**  The weak-form
  divergence ``M^{-1} sum_a D_a^T (M F_xia)`` is einsums of the small
  derivative matrices over the ``[E, Nq3, Nq2, Nq1, V]`` state block; XLA
  maps these onto the MXU as batched matmuls and fuses the metric
  multiplies into them.
- **Interface terms are gathers + one matmul.**  Face states are gathered
  with the precomputed ``vmapM/vmapP`` maps; the numerical flux is a
  vectorized Riemann solve over all faces at once; the surface lift is a
  single static 0/1 matrix multiply (``grid.lift``) instead of a scatter.
- **No comm code here.**  The same operator runs single-chip or sharded:
  under ``shard_map``/GSPMD the cross-shard gathers become halo collectives
  (see climatemachine_tpu.parallel); the reference's
  begin/end_ghost_exchange! pairs (DGModel.jl:126-398) have no analog.
- **Direction splitting** (Every/Horizontal/Vertical, reference
  SpaceDiscretization.jl:1090) selects which reference dims and faces
  contribute; used by IMEX (vertical-implicit) and multirate splittings.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from climatemachine_tpu.balance_laws import state_types as st
from climatemachine_tpu.dg.numerical_fluxes import (
    CentralNumericalFluxGradient, CentralNumericalFluxSecondOrder,
    RusanovNumericalFlux,
)

EVERY = "every"
HORIZONTAL = "horizontal"
VERTICAL = "vertical"


def direction_dims(direction: str, dim: int) -> Tuple[int, ...]:
    if direction == EVERY:
        return tuple(range(dim))
    if direction == HORIZONTAL:
        return tuple(range(dim - 1))
    if direction == VERTICAL:
        return (dim - 1,)
    raise ValueError(direction)


def direction_faces(direction: str, dim: int) -> Tuple[int, ...]:
    return tuple(f for d in direction_dims(direction, dim)
                 for f in (2 * d, 2 * d + 1))


def _to_block(grid, x):
    """[E, Np, ...] -> [E, Nq_d-1, ..., Nq_0, ...] (k slowest, i fastest)."""
    E = x.shape[0]
    return x.reshape((E,) + tuple(grid.Nq[::-1]) + x.shape[2:])


def _to_flat(grid, x):
    E = x.shape[0]
    return x.reshape((E, grid.Np) + x.shape[1 + grid.dim:])


def _apply_D(grid, xb, refdim: int, transpose: bool = False):
    """Contract D (or D^T) along reference dim ``refdim`` of a block array
    [E, Nq_{d-1}, ..., Nq_0, trailing...]."""
    dim = grid.dim
    axis = dim - refdim  # block axes: 0=E, 1..dim (slowest..fastest)
    D = grid.D[refdim]
    M = D if not transpose else D.T
    # tensordot contracts x axis with M axis 1 (column), result appended last
    out = jnp.tensordot(xb, M, axes=((axis,), (1,)))
    return jnp.moveaxis(out, -1, axis)


# TPU numerics: derivative-matrix contractions MUST run at full f32
# (Precision.HIGHEST); the platform default lowers f32 dot to bf16
# multiplies, which costs ~3 decimal digits on the spectral derivative
# (measured 0.27 relative error on the Held-Suarez volume term).
_HI = jax.lax.Precision.HIGHEST


def weak_divergence(grid, F_xi, dims: Sequence[int]):
    """sum_a D_a^T (M * F_xia) for a in dims.  F_xi: [E, Np, dim, n].

    Fast path: the per-direction Kronecker operators are pre-concatenated
    into one [Np, dim*Np] matrix (grid.Wdiv); the batch and variable axes
    are folded into the matmul's ROW dimension ([E·n, dim·Np] × [dim·Np,
    Np]) so the lane dimension is the full Np=O(128), not the tiny
    variable count (13.6x faster than the naive batched einsum at p4)."""
    MF = grid.M[..., None, None] * F_xi                 # [E, Np, dim, n]
    if grid.Wdiv is not None:
        E, n = MF.shape[0], MF.shape[-1]
        dim = grid.dim
        if len(dims) == dim:
            W = grid.Wdiv
            sel = MF
        else:
            W = jnp.concatenate(
                [grid.Wdiv[:, a * grid.Np:(a + 1) * grid.Np] for a in dims],
                axis=1)
            sel = MF[:, :, list(dims), :]
        nd = sel.shape[2]
        # [E, Np, nd, n] -> [E, n, nd, Np] -> [E*n, nd*Np]
        MFr = sel.transpose(0, 3, 2, 1).reshape(E * n, nd * grid.Np)
        out = jnp.matmul(MFr, W.T, precision=_HI)       # [E*n, Np]
        return out.reshape(E, n, grid.Np).transpose(0, 2, 1)
    out = None
    for a in dims:
        term = _to_flat(grid, _apply_D(grid, _to_block(grid, MF[:, :, a, :]),
                                       a, transpose=True))
        out = term if out is None else out + term
    return out


def weak_divergence_sel(grid, F_xi_sel, dims: Sequence[int]):
    """weak_divergence for a pre-selected direction axis: F_xi_sel
    [E, Np, len(dims), n] (as produced by contract_flux_metric)."""
    MF = grid.M[..., None, None] * F_xi_sel
    E, n = MF.shape[0], MF.shape[-1]
    nd = len(dims)
    if grid.Wdiv is not None:
        if nd == grid.dim:
            W = grid.Wdiv
        else:
            W = jnp.concatenate(
                [grid.Wdiv[:, a * grid.Np:(a + 1) * grid.Np] for a in dims],
                axis=1)
        MFr = MF.transpose(0, 3, 2, 1).reshape(E * n, nd * grid.Np)
        out = jnp.matmul(MFr, W.T, precision=_HI)
        return out.reshape(E, n, grid.Np).transpose(0, 2, 1)
    out = None
    for k, a in enumerate(dims):
        term = _to_flat(grid, _apply_D(grid, _to_block(grid, MF[:, :, k, :]),
                                       a, transpose=True))
        out = term if out is None else out + term
    return out


def contract_flux_metric(grid, F, dims: Sequence[int]):
    """F_xi[e,n,a,v] = xi_a,x_i F_i: unrolled over the short (a, i) axes
    as pure VPU multiply-adds — a dot_general over a length-3 axis with
    the variable count in the lane dimension is ~12x slower AND silently
    bf16 on TPU."""
    parts = []
    for a in dims:
        acc = 0.0
        for i in range(grid.xi_x.shape[2]):
            acc = acc + grid.xi_x[:, :, a, i, None] * F[:, :, i, :]
        parts.append(acc)
    return jnp.stack(parts, axis=2)                     # [E, Np, nd, n]


def ref_gradient(grid, g, dims: Sequence[int]):
    """All reference-direction derivatives in one matmul:
    g [E, Np, ng] -> [E, len(dims), Np, ng] (D_a g per a).  Row-major
    fold ([E·ng, Np] × [Np, nd·Np]) keeps the lane dimension wide."""
    E, ng = g.shape[0], g.shape[-1]
    if grid.Wgrad is not None:
        if len(dims) == grid.dim:
            W = grid.Wgrad
        else:
            W = jnp.concatenate(
                [grid.Wgrad[a * grid.Np:(a + 1) * grid.Np, :] for a in dims],
                axis=0)
        gr = g.transpose(0, 2, 1).reshape(E * ng, grid.Np)
        out = jnp.matmul(gr, W.T, precision=_HI)        # [E*ng, nd*Np]
        out = out.reshape(E, ng, len(dims), grid.Np)
        return out.transpose(0, 2, 3, 1)                # [E, nd, Np, ng]
    gb = _to_block(grid, g)
    terms = [_to_flat(grid, _apply_D(grid, gb, a)) for a in dims]
    return jnp.stack(terms, axis=1)


def strong_gradient(grid, g, dims: Sequence[int]):
    """Chain-rule nodal gradient: d g / d x_i = sum_a xi_a,x_i * D_a g.
    g: [E, Np, ng] -> [E, Np, ncoord, ng].

    Derivatives ride one Wgrad MXU matmul; the metric contraction is a
    short VPU multiply-add loop (contraction length dim≤3 is too small
    for a matmul)."""
    dg = ref_gradient(grid, g, dims)                    # [E, na, Np, ng]
    out = 0.0
    for idx, a in enumerate(dims):
        out = out + (grid.xi_x[:, :, a, :, None]
                     * dg[:, idx][:, :, None, :])
    return out


class DGModel:
    """Strong-stability weak-form DGSEM RHS (reference DGModel.jl:3,:85).

    Calling ``dg(q, aux, t)`` returns ``(dq/dt, aux')`` where aux' has the
    model's auxiliary update applied (functional replacement for the
    reference's in-place aux mutation at DGModel.jl:110).
    """

    def __init__(self, balance_law, grid,
                 numerical_flux_first_order=None,
                 numerical_flux_gradient=None,
                 numerical_flux_second_order=None,
                 direction: str = EVERY,
                 diffusion_direction: Optional[str] = None,
                 update_aux: bool = True,
                 exchange=None,
                 remainder=None,
                 volume_kernel: str = "auto",
                 surface_kernel: str = "auto",
                 ldg_kernel: str = "auto",
                 row_halo=None):
        self.balance_law = balance_law
        self.grid = grid
        # kept so a sharding wrapper can clone this model with identical
        # kernel selections inside shard_map
        self.kernel_opts = dict(volume_kernel=volume_kernel,
                                surface_kernel=surface_kernel,
                                ldg_kernel=ldg_kernel)
        # Sharded var-major face-ROW halo (parallel/sharded.py _RowHalo):
        # {active_faces_tuple: halo} — lets the fast surface pass and the
        # var-major LDG chain stay on under shard_map (the node-space
        # ``exchange`` hook serves the generic paths).  halo.gather(R2)
        # returns the neighbor row for every local active row.
        self.row_halo = row_halo or {}
        self.nf1 = numerical_flux_first_order or RusanovNumericalFlux()
        self.nfg = numerical_flux_gradient or CentralNumericalFluxGradient()
        self.nf2 = numerical_flux_second_order or CentralNumericalFluxSecondOrder()
        self.direction = direction
        self.diffusion_direction = diffusion_direction or direction
        self.update_aux = update_aux
        # Halo hook (reference begin/end_ghost_exchange!, DGModel.jl:126-398):
        # maps the flat [E*Np, n] node array to an extended array whose tail
        # holds remote face nodes; grid.vmapP of a sharded grid points there.
        self.exchange = exchange
        # Fused remainder (reference remainder.jl RemBL / remainder_DGModel):
        # (linear_bl, linear_direction) — this RHS evaluates full − linear
        # in ONE volume contraction + ONE face pass instead of two DG
        # evaluations (the linear flux/numerical-flux/source are subtracted
        # in the linear model's direction slots only).  Exactly equal to
        # the two-call difference, at roughly half the memory traffic.
        self.remainder = remainder
        # Pallas fused volume kernel (dg/pallas_volume.py): "auto" uses
        # it for supported dry-Euler configs on TPU; "pallas" forces it
        # (interpret mode off-TPU, for testing); "xla" disables.
        self._pallas_volume = False
        self._pallas_interpret = False
        if volume_kernel in ("auto", "pallas"):
            from climatemachine_tpu.dg import pallas_volume as _pv
            if _pv.supports(balance_law, grid, direction, remainder):
                on_tpu = jax.default_backend() == "tpu"
                if volume_kernel == "pallas" or on_tpu:
                    self._pallas_volume = True
                    self._pallas_interpret = not on_tpu

        # static tables for the rows-layout LDG path, keyed (n, faces[, nc])
        self._rows_cache = {}
        # rows-layout LDG gradient/divergence chain: opt-in ("rows").
        # Hardware A/B (HS p4, 12288 elems, TPU v5e): legacy 4-D chain
        # 24.2 ms/RHS vs rows 35.3 — XLA lays out the wide rows matmuls
        # worse than the predicted microbench win; the scalar n-dot-F2
        # hyper face exchange (independent of this flag) keeps the win
        # that DID materialize.
        self._ldg_rows = ldg_kernel == "rows"
        # var-major LDG chain (dg/ldg_varmajor.py): every face tensor 2-D
        # with the wide axis last; "auto" uses it where supported.
        self._ldg_vm = False
        if ldg_kernel in ("auto", "varmajor", "pallas"):
            from climatemachine_tpu.dg import ldg_varmajor as _lvm
            self._ldg_vm = _lvm.supports(self)
        # fused Pallas chain (dg/pallas_ldg.py): opt-in ("pallas");
        # interpret mode off-TPU (parity testing)
        self._ldg_pl = False
        if ldg_kernel == "pallas" and self._ldg_vm:
            self._ldg_pl = True
            self._ldg_pl_interpret = jax.default_backend() != "tpu"

        # Var-major surface pass (dg/fast_surface.py): "auto" uses it on
        # TPU where supported (hardware A/B, HS p4/12k elems: RHS 58.0 ->
        # 45.4 ms, step 284.6 -> 225.5); "varmajor" forces it (any
        # backend); "xla" disables.
        self._fast_surface = False
        if surface_kernel == "varmajor" or (
                surface_kernel == "auto"
                and jax.default_backend() == "tpu"):
            from climatemachine_tpu.dg import fast_surface as _fs
            self._fast_surface = _fs.supports(self)
            if self._fast_surface:
                # build the host-side neighbor tables NOW, while the
                # grid is concrete (inside jit it may be a traced pytree)
                _fs._tables(self)

        bl = balance_law
        self.n_prognostic = bl.num_state(st.Prognostic())
        self.n_auxiliary = bl.num_state(st.Auxiliary())
        self.n_gradient = bl.num_state(st.Gradient())
        self.n_gradient_flux = bl.num_state(st.GradientFlux())

    # --- face helpers -------------------------------------------------------

    def _face_rows(self, x):
        """All minus-side face values as gather-ready rows
        [E*nface, Nfp_max*n] (node-major within a row), built by slicing
        the block tensor and flattening (node, var) per face BEFORE any
        materialization.  Stacking the unmerged [E, nface, Nfp, n] form
        first and reshaping later costs a 128/n-padded relayout copy (TPU
        (8,128) tiling pads the small trailing variable axis) — measured
        3.3 ms of pure copy per exchange at p4/19 vars."""
        g = self.grid
        E, n = x.shape[0], x.shape[-1]
        xb = _to_block(g, x)
        if g.dim == 3:
            sl = [xb[:, :, :, 0], xb[:, :, :, -1],    # f0/f1: (k, j)
                  xb[:, :, 0, :], xb[:, :, -1, :],    # f2/f3: (k, i)
                  xb[:, 0, :, :], xb[:, -1, :, :]]    # f4/f5: (j, i)
        else:
            sl = [xb[:, :, 0], xb[:, :, -1], xb[:, 0, :], xb[:, -1, :]]
        X = g.Nfp_max * n
        out = []
        for s in sl:
            v = s.reshape(E, -1)                      # [E, Nfp_f*n]
            if v.shape[1] < X:
                # mixed-order grids: faces have unequal Nfp, rows are
                # padded to Nfp_max.  Pad by REPLICATING the face's
                # first node (variable-aligned), not zeros: padded lanes
                # have sM = 0 so they never contribute, but a zero STATE
                # is unphysical (rho = 0) and numerical fluxes divide by
                # it — NaN·0 from the lift would poison the tendency.
                reps = (X - v.shape[1]) // n
                v = jnp.concatenate([v, jnp.tile(v[:, :n], (1, reps))],
                                    axis=1)
            out.append(v)
        return jnp.stack(out, axis=1).reshape(E * g.nface, X)

    def _face_minus(self, x):
        """[E, Np, n] -> [E, nface, Nfp_max, n], fmask order."""
        g = self.grid
        E, n = x.shape[0], x.shape[-1]
        return self._face_rows(x).reshape(E, g.nface, g.Nfp_max, n)

    def _gather_faces(self, x, faces):
        """x: [E, Np, n] -> (xM, xP): [E, nf_active, Nfp, n].

        TPU fast path (see Grid.face_nbr_row): minus side by slicing, plus
        side by one row gather over [E*nface] face rows + orientation
        one-hot einsum — replaces the reference's volume-node vmap⁻/vmap⁺
        gathers (Grids.jl:200-215), which map to slow node-granular TPU
        gathers.
        """
        g = self.grid
        if g.face_nbr_row is None or self.exchange is not None:
            # legacy/sharded path: node-space gathers with halo extension
            flat = x.reshape((-1,) + x.shape[2:])
            if self.exchange is not None:
                flat = self.exchange(flat)
            idxM = g.vmapM[:, faces, :]
            idxP = g.vmapP[:, faces, :]
            return flat[idxM], flat[idxP]

        # NOTE: a direction-restricted variant (build + gather rows for
        # only the active faces) was tried and measured SLOWER in
        # composition (44 vs 14 ms for the hyperdiffusion divergence at
        # p4/12k elems): XLA's layout assignment picks a column-major
        # rows layout for the 4-slice stack and cascades 5-D relayout
        # copies downstream.  The full-face exchange keeps the proven
        # layout; directional callers slice afterwards.
        E, n = x.shape[0], x.shape[-1]
        all_faces = tuple(range(g.nface))
        rows = self._face_rows(x)                          # [E*nface, X]
        xM_all = rows.reshape(E, g.nface, g.Nfp_max, n)
        nbr = rows[g.face_nbr_row]                         # row gather
        nbr = nbr.reshape(E, g.nface, g.Nfp_max, n)
        # orientation permutation as a precomputed integer index map
        # (identity on axis-aligned grids -> free; a take_along_axis
        # otherwise — never a tiny-lane matmul)
        if g.face_perm_identity:
            xP_all = nbr
        else:
            xP_all = jnp.take_along_axis(nbr, g.face_perm_idx[..., None],
                                         axis=2)
        if faces == all_faces:
            return xM_all, xP_all
        return xM_all[:, faces], xP_all[:, faces]

    def _boundary_plus(self, tagged_fn, faces, nrm, qM, auxM, qP, auxP, t):
        """Overwrite (qP, auxP) on boundary faces with ghost states.

        ``tagged_fn(tag) -> (qP_tag, auxP_tag)``; tags are static, so this
        unrolls into a few masked selects (no dynamic dispatch under jit).
        """
        g = self.grid
        tags = g.elem_bctags
        if not tags:
            return qP, auxP
        bctag = g.face_bctag[:, faces]             # [E, nf_active]
        for tag in tags:
            qB, auxB = tagged_fn(tag)
            mask = (bctag == tag)[..., None, None]  # broadcast over Nfp, n
            qP = jnp.where(mask, qB, qP)
            auxP = jnp.where(mask, auxB, auxP)
        return qP, auxP

    def _lift(self, face_term, faces):
        """Surface lift: face_term [E, nf_active, Nfp, n...] -> [E, Np, n...],
        multiplied by M^{-1}.  One static matmul (grid.lift)."""
        g = self.grid
        E = face_term.shape[0]
        trailing = face_term.shape[3:]
        cols = [g.lift[:, f * g.Nfp_max:(f + 1) * g.Nfp_max] for f in faces]
        L = jnp.concatenate(cols, axis=1)          # [Np, nf_active*Nfp_max]
        nfq = len(faces) * g.Nfp_max
        ft = face_term.reshape(E, nfq, -1)
        C = ft.shape[-1]
        # row-major fold: [E*C, nfq] @ [nfq, Np] keeps the lane wide
        ftr = ft.transpose(0, 2, 1).reshape(E * C, nfq)
        out = jnp.matmul(ftr, L.T, precision=_HI)
        out = out.reshape(E, C, g.Np).transpose(0, 2, 1)
        out = out.reshape((E, g.Np) + trailing)
        return g.MI.reshape(E, g.Np, *([1] * len(trailing))) * out

    # --- gradient pass -------------------------------------------------------

    def spatial_gradient(self, q, aux, t):
        """DG gradient of the model's gradient-argument variables.
        Returns grad_g [E, Np, ncoord, ng]."""
        bl, g = self.balance_law, self.grid
        dims = direction_dims(self.diffusion_direction, g.dim)
        faces = direction_faces(self.diffusion_direction, g.dim)

        garg = bl.compute_gradient_argument(q, aux, t)
        grad = strong_gradient(g, garg, dims)

        nq = q.shape[-1]
        bM, bP = self._gather_faces(jnp.concatenate([q, aux], axis=-1),
                                    faces)
        qM, auxM = bM[..., :nq], bM[..., nq:]
        qP, auxP = bP[..., :nq], bP[..., nq:]
        nrm = g.normals[:, faces, :, :]

        def ghost(tag):
            return bl.boundary_state(tag, nrm, qM, auxM, t)

        qP, auxP = self._boundary_plus(ghost, faces, nrm, qM, auxM, qP, auxP, t)
        gM = bl.compute_gradient_argument(qM, auxM, t)
        gP = bl.compute_gradient_argument(qP, auxP, t)
        corr = self.nfg(bl, nrm, gM, gP)            # [E, nf, Nfp, ncoord, ng]
        sM = g.sM[:, faces, :, None, None]
        grad = grad + self._lift(sM * corr, faces)
        return grad

    # --- generic LDG helpers (hyperdiffusion chain) --------------------------
    #
    # Two implementations:
    #  * rows layout (local grids): ALL face math stays in gather-ready
    #    rows [E*nface, Nfp*n] — no [E, nface, Nfp, n] materialization.
    #    The 4-D face tensor costs a (8,128)-tile relayout (trailing n≪128
    #    padded to a full lane tile) measured at 2-3 ms per exchange at
    #    p4/12k elems; the rows form keeps lanes = Nfp·n wide.  Orientation
    #    is a handful of masked [X,X] kron-permutation matmuls (identity on
    #    axis-aligned and this cubed-sphere topology's grids — free), the
    #    lift is one static [nface·Nfp·n, Np·n] kron(Lᵀ, I_n) matmul.
    #  * legacy 4-D face tensors (sharded grids, vmap gathers).

    def _ldg_rows_tables(self, n, ncd):
        """Rows-layout tables for width n (cached per width).

        Everything derived from grid ARRAYS is deferred behind lambdas
        re-evaluated at every trace: (a) the grid may itself be a traced
        pytree (solver jits close over it as inputs in some setups), so
        no np.asarray on its fields; (b) baking the wide lane-expanded
        geometry rows ([E·nface, Nfp·n] ≈ 30-90 MB) as jit constants
        blew the remote compiler's request-size limit (HTTP 413) —
        jnp.repeat of already-resident grid arrays is free to ship and
        XLA constant-folds it when the grid is concrete."""
        key = (n, ncd)
        tab = self._rows_cache.get(key)
        if tab is not None:
            return tab
        import numpy as np
        g = self.grid
        E, nface, Nfp, Np = g.nelem, g.nface, g.Nfp_max, g.Np
        dt = np.dtype(g.sM.dtype)

        def rep(a):                            # [E, nface, Nfp] -> lanes ×n
            return jnp.repeat(a.reshape(E * nface, Nfp), n, axis=1)

        tab = {}
        tab["sM_rows"] = lambda: rep(g.sM)
        tab["sMn_rows"] = tuple(
            (lambda c=c: rep(g.sM * g.normals[..., c]))
            for c in range(ncd))
        # n·v contraction in rows layout: lane (k,c,j) weights + summer
        tab["nrm_lane"] = lambda: jnp.repeat(
            g.normals.reshape(E * nface, Nfp * ncd), n, axis=1)
        S = np.kron(np.eye(Nfp, dtype=dt),
                    np.kron(np.ones((ncd, 1), dtype=dt), np.eye(n, dtype=dt)))
        tab["S"] = S                           # numpy [Nfp*ncd*n, Nfp*n]
        # (kept as numpy in the cache: a jnp constant made under one
        # trace leaks into later traces; converted at use)
        # boundary rows: neighbor is self, n⁺ = n⁻ (no sign flip)
        tab["nbr_sign"] = lambda: jnp.where(
            g.face_bctag.reshape(E * nface, 1) != 0,
            jnp.ones((), dt), -jnp.ones((), dt))
        # orientation: per-(face, code) masked kron-permutation matmuls
        # (identity topologies — bricks and this cubed-sphere builder —
        # skip this entirely via face_perm_identity)
        def make_perms():
            if g.face_perm_identity:
                return ()
            sel = np.eye(nface, dtype=dt)
            out = []
            n_codes = g.face_perm_P.shape[1]
            eye_n = jnp.eye(n, dtype=dt)
            for f in range(nface):
                for c in range(n_codes):
                    m = (g.face_orient_onehot[:, :, c]
                         * jnp.asarray(sel[f])[None, :])
                    PK = jnp.kron(g.face_perm_P[f, c].astype(dt), eye_n)
                    out.append((m.reshape(E * nface, 1), PK))
            return tuple(out)
        tab["perms"] = make_perms
        self._rows_cache[key] = tab
        return tab

    def _lift_rows_W(self, n, faces):
        """Lift as one static kron matmul: W[(f,k,j),(p,j)] = L[p, f·Nfp+k]
        with inactive faces zeroed (feeding all-face rows avoids the
        active-face slice + minor-dim merge relayout).  Built with jnp
        (trace-safe for traced grids; constant-folded otherwise)."""
        import numpy as np
        g = self.grid
        key = ("Wmask", faces)
        mask = self._rows_cache.get(key)
        if mask is None:
            # cache NUMPY only: a jnp constant created under one jit trace
            # is a tracer there, and reusing it from the cache in a second
            # trace raises UnexpectedTracerError
            mask = np.zeros((g.nface * g.Nfp_max,), np.dtype(g.lift.dtype))
            for f in faces:
                mask[f * g.Nfp_max:(f + 1) * g.Nfp_max] = 1
            self._rows_cache[key] = mask
        Lz = g.lift * jnp.asarray(mask)[None, :]
        return jnp.kron(Lz.T, jnp.eye(n, dtype=g.lift.dtype))

    def _perm_rows(self, x_rows, tab):
        """Apply per-row face orientation in rows layout."""
        if self.grid.face_perm_identity:
            return x_rows
        out = 0.0
        for mask, PK in tab["perms"]():
            out = out + mask * jnp.matmul(x_rows, PK, precision=_HI)
        return out

    def dg_gradient_of(self, x, direction: Optional[str] = None):
        """Central-flux DG gradient of arbitrary fields x [E, Np, n] ->
        [E, Np, ncoord, n] (reference volume_gradients! /
        dgsem_interface_gradients!, DGModel_kernels.jl:934/:1365)."""
        g = self.grid
        direction = direction or self.diffusion_direction
        dims = direction_dims(direction, g.dim)
        faces = direction_faces(direction, g.dim)
        grad = strong_gradient(g, x, dims)
        if g.face_nbr_row is not None and self.exchange is None \
                and self._ldg_rows:
            E, n = x.shape[0], x.shape[-1]
            ncd = g.normals.shape[-1]
            tab = self._ldg_rows_tables(n, ncd)
            W = self._lift_rows_W(n, faces)
            rows = self._face_rows(x)                  # [E*nface, Nfp*n]
            xP = self._perm_rows(rows[g.face_nbr_row.reshape(-1)], tab)
            d = 0.5 * (xP - rows)
            outs = []
            for c in range(ncd):
                t = (tab["sMn_rows"][c]() * d).reshape(E, -1)
                outs.append(jnp.matmul(t, W, precision=_HI)
                            .reshape(E, g.Np, n))
            corr = jnp.stack(outs, axis=2)             # [E, Np, ncd, n]
            return grad + g.MI[:, :, None, None] * corr
        xM, xP = self._gather_faces(x, faces)
        nrm = g.normals[:, faces, :, :]
        corr = nrm[..., :, None] * (0.5 * (xP + xM) - xM)[..., None, :]
        sM = g.sM[:, faces, :, None, None]
        return grad + self._lift(sM * corr, faces)

    def dg_divergence_of(self, v, direction: Optional[str] = None):
        """Central-flux DG divergence of v [E, Np, ncoord, n] -> [E, Np, n]
        (reference volume_divergence_of_gradients,
        DGModel_kernels.jl:2132-2400)."""
        g = self.grid
        direction = direction or self.diffusion_direction
        dims = direction_dims(direction, g.dim)
        faces = direction_faces(direction, g.dim)
        # strong divergence: sum_a xi_a,x_i D_a v_i (one fused matmul for
        # the derivatives, VPU loop for the short metric contraction)
        E, nc, n = v.shape[0], v.shape[2], v.shape[3]
        vflat = v.reshape(E, g.Np, nc * n)
        dv = ref_gradient(g, vflat, dims)
        dv = dv.reshape(E, len(dims), g.Np, nc, n)
        div = 0.0
        for idx, a in enumerate(dims):
            div = div + jnp.sum(g.xi_x[:, :, a, :, None] * dv[:, idx],
                                axis=2)
        # interface central correction: n·(v* − v⁻) = 0.5 n·(vP − vM)
        if g.face_nbr_row is not None and self.exchange is None \
                and self._ldg_rows:
            # SCALAR exchange in rows layout: each side computes
            # s = n·v with its OWN outward normal; the neighbor's value
            # enters as n⁻·vP = −s⁺ (watertight mesh), so only an
            # n-wide row rides the gather instead of ncd·n.
            tab = self._ldg_rows_tables(n, nc)
            W = self._lift_rows_W(n, faces)
            rows_v = self._face_rows(vflat)            # [E*nf, Nfp*ncd*n]
            s = jnp.matmul(rows_v * tab["nrm_lane"](), jnp.asarray(tab["S"]),
                           precision=_HI)              # [E*nf, Nfp*n]
            s_nbr = self._perm_rows(s[g.face_nbr_row.reshape(-1)], tab)
            d = 0.5 * (tab["nbr_sign"]() * s_nbr - s)
            t = (tab["sM_rows"]() * d).reshape(E, -1)
            corr = jnp.matmul(t, W, precision=_HI).reshape(E, g.Np, n)
            return div + g.MI[:, :, None] * corr
        nrm = g.normals[:, faces, :, :]
        vM, vP = self._gather_faces(vflat, faces)
        vM = vM.reshape(vM.shape[:-1] + (nc, n))
        vP = vP.reshape(vP.shape[:-1] + (nc, n))
        diff = 0.5 * (vP + vM) - vM
        corr = sum(nrm[..., c, None] * diff[..., c, :]
                   for c in range(nrm.shape[-1]))
        sM = g.sM[:, faces, :, None]
        return div + self._lift(sM * corr, faces)

    def hyperdiffusive_state(self, q, aux, t):
        """∇(Δ(g)) chain (reference DGModel.jl:226-310: two extra halo
        rounds; under shard_map the face gathers carry them).

        Direction: the balance law may pin the chain's direction (the
        atmos biharmonic closures are horizontal-only, reference HS
        diffdir=HorizontalDirection) via ``hyperdiffusion_direction``.
        """
        bl = self.balance_law
        direction = getattr(bl, "hyperdiffusion_direction", None) \
            or self.diffusion_direction
        if self._ldg_pl:
            from climatemachine_tpu.dg import pallas_ldg as _plg
            out = _plg.hyper_chain(self, q, aux, t, direction,
                                   interpret=self._ldg_pl_interpret)
            if out is not None:
                return out
        if self._ldg_vm:
            from climatemachine_tpu.dg import ldg_varmajor as _lvm
            out = _lvm.hyper_chain(self, q, aux, t, direction)
            if out is not None:
                return out
        gl = bl.compute_gradient_laplacian_argument(q, aux, t)
        grad = self.dg_gradient_of(gl, direction)
        lap = self.dg_divergence_of(grad, direction)
        grad_lap = self.dg_gradient_of(lap, direction)
        return bl.transform_post_gradient_laplacian(grad_lap, q, aux, t)

    def _scalar_hyper_correction(self, q, aux, F2, faces):
        """Hyper-only second-order interface term via the scalar n·F₂
        rows exchange: returns the (signed) tendency contribution
        −M⁻¹ L (sM · 0.5(n·F₂M + n·F₂P)) masked to interior faces."""
        if self._ldg_vm:
            from climatemachine_tpu.dg import ldg_varmajor as _lvm
            out = _lvm.scalar_hyper_correction(self, F2, faces)
            if out is not None:
                return out
        g = self.grid
        E, nq = q.shape[0], q.shape[-1]
        tab = self._ldg_rows_tables(nq, F2.shape[2])
        W = self._lift_rows_W(nq, faces)
        rows_F2 = self._face_rows(F2.reshape(E, g.Np, -1))
        s = jnp.matmul(rows_F2 * tab["nrm_lane"](), jnp.asarray(tab["S"]),
                       precision=_HI)                  # [E*nf, Nfp*nq]
        s_nbr = self._perm_rows(s[g.face_nbr_row.reshape(-1)], tab)
        interior = g.face_bctag.reshape(-1, 1) == 0
        d2 = jnp.where(interior, 0.5 * (s - s_nbr), 0.0)
        corr2 = jnp.matmul((tab["sM_rows"]() * d2).reshape(E, -1), W,
                           precision=_HI).reshape(E, g.Np, nq)
        return -(g.MI[:, :, None] * corr2)

    # --- full RHS -------------------------------------------------------------

    def pre_stage(self, q, aux, t):
        """State projection applied by the time integrators before every
        RHS evaluation (``pre_stage=dg.pre_stage``), mirroring the
        reference's in-place filter mutation of Q inside
        update_auxiliary_state! (hydrostatic_boussinesq_model.jl:626-663).
        The integrated state continues from the projected state, so
        unresolved modes are actually removed rather than merely hidden
        from the tendency."""
        return self.balance_law.preprocess_state(self, q, aux, t)

    def __call__(self, q, aux, t):
        bl, g = self.balance_law, self.grid
        if self.update_aux:
            aux = bl.update_auxiliary_state(g, q, aux, t)

        dims = direction_dims(self.direction, g.dim)
        faces = direction_faces(self.direction, g.dim)

        gf = None
        if self.n_gradient > 0:
            grad_g = self.spatial_gradient(q, aux, t)
            gf = bl.compute_gradient_flux(grad_g, q, aux, t)
            aux, q = bl.update_auxiliary_state_gradient(self, gf, q, aux, t)

        hyper = None
        if bl.num_state(st.Hyperdiffusive()) > 0:
            hyper = self.hyperdiffusive_state(q, aux, t)

        # volume: M^{-1} D^T M F_xi
        # Pallas fused kernel covers the FIRST-ORDER part (flux + metric
        # contraction + weak divergence fully in VMEM); any second-order
        # flux rides the generic contraction on top.
        use_pallas = self._pallas_volume and gf is None
        F2 = (bl.flux_second_order(q, gf, hyper, aux, t)
              if (gf is not None or hyper is not None) else None)
        tendency = None
        if use_pallas:
            # remainder handled INSIDE the kernel (linear flux subtracted
            # on its direction slots in VMEM — see pallas_volume._kernel)
            from climatemachine_tpu.dg import pallas_volume as _pv
            tendency = _pv.volume_tendency_from_grid(
                self, q, aux, interpret=self._pallas_interpret)
            F = F2
        else:
            F = bl.flux_first_order(q, aux, t)
            if F2 is not None:
                F = F + F2
        # F: [E, Np, ncoord, n]; F_xi[a] = xi_a,x_i F_i
        F_xi = contract_flux_metric(g, F, dims) if F is not None else None
        if self.remainder is not None and not use_pallas:
            lin, ldir = self.remainder
            ldims = direction_dims(ldir, g.dim)
            F_lin = lin.flux_first_order(q, aux, t)
            F_xi_lin = contract_flux_metric(g, F_lin, ldims)
            for i, a in enumerate(ldims):
                pos = dims.index(a)
                F_xi = F_xi.at[..., pos, :].add(-F_xi_lin[..., i, :])
        if F_xi is not None:
            wd = g.MI[..., None] * weak_divergence_sel(g, F_xi, dims)
            tendency = wd if tendency is None else tendency + wd

        # interface: - M^{-1} L (sM F*)
        # single fused face exchange: q, aux (and gf/hyper when present)
        # ride one slice-extract + one row gather + one orientation einsum.
        # (Exchanging only the state-dependent aux slots and rebuilding
        # the plus side by scatter was tried and measured SLOWER: the
        # separate minus-side rows build + scatter relayout cost more
        # than the narrower gather saved.)
        #
        # Hyper-only second-order flux (no gradient state): the central
        # flux 0.5(F₂M + F₂P)·n rides a SCALAR n·F₂ rows exchange (n_prog
        # wide) instead of shipping the hyperdiffusive state (3·n_grad_lap
        # wide) — each side contracts its volume F₂ with its own outward
        # normal, the neighbor enters as −s⁺.  Wall faces carry no
        # hyperdiffusive transport (F₂ is linear in the hyper state), so
        # the correction is masked to interior faces — exactly the
        # hyM/hyP zeroing of the generic path.
        scalar_hyper_avail = (
            (g.face_nbr_row is not None and self.exchange is None)
            or (self._ldg_vm and tuple(faces) in self.row_halo))
        use_scalar_hyper = (hyper is not None and gf is None
                            and scalar_hyper_avail
                            and not getattr(bl, "has_boundary_flux_second_order",
                                            hasattr(bl, "boundary_flux_second_order")))
        nq, naux = q.shape[-1], aux.shape[-1]
        if self._fast_surface and gf is None and use_scalar_hyper == (
                hyper is not None):
            from climatemachine_tpu.dg import fast_surface as _fs
            tendency = tendency + _fs.surface_tendency(self, q, aux, t)
            if use_scalar_hyper:
                tendency = tendency + self._scalar_hyper_correction(
                    q, aux, F2, faces)
            tendency = tendency + bl.source(q, gf, aux, t)
            if self.remainder is not None:
                tendency = tendency - self.remainder[0].source(q, gf, aux, t)
            return tendency, aux

        parts = [q, aux]
        if gf is not None:
            parts.append(gf)
        if hyper is not None and not use_scalar_hyper:
            parts.append(hyper)
        bundleM, bundleP = self._gather_faces(
            jnp.concatenate(parts, axis=-1), faces)
        qM, auxM = bundleM[..., :nq], bundleM[..., nq:nq + naux]
        qP, auxP = bundleP[..., :nq], bundleP[..., nq:nq + naux]
        off = nq + naux
        nrm = g.normals[:, faces, :, :]

        def ghost(tag):
            return bl.boundary_state(tag, nrm, qM, auxM, t)

        qP, auxP = self._boundary_plus(ghost, faces, nrm, qM, auxM, qP, auxP, t)
        fstar = self.nf1(bl, nrm, qM, auxM, qP, auxP, t)
        if self.remainder is not None:
            # subtract the linear numerical flux on the linear model's
            # faces (same gathered face states — no second exchange)
            lin, ldir = self.remainder
            lfaces = direction_faces(ldir, g.dim)
            pos = [faces.index(f) for f in lfaces]
            assert pos == list(range(pos[0], pos[0] + len(pos))), \
                "linear faces must be contiguous in the active face set"
            sl = slice(pos[0], pos[0] + len(pos))
            fstar_lin = self.nf1(lin, nrm[:, sl], qM[:, sl], auxM[:, sl],
                                 qP[:, sl], auxP[:, sl], t)
            fstar = fstar.at[:, sl].add(-fstar_lin)

        if (gf is not None or hyper is not None) and not use_scalar_hyper:
            gfM = gfP = None
            if gf is not None:
                ngf = gf.shape[-1]
                gfM = bundleM[..., off:off + ngf]
                gfP = bundleP[..., off:off + ngf]
                off += ngf
                bctag = g.face_bctag[:, faces]
                for tag in g.elem_bctags:
                    gfB = bl.boundary_state_gradient_flux(tag, nrm, gfM, qM,
                                                          auxM, t)
                    gfP = jnp.where((bctag == tag)[..., None, None], gfB, gfP)
            hyM = hyP = None
            if hyper is not None:
                hyM = bundleM[..., off:]
                hyP = bundleP[..., off:]
                # no hyperdiffusive transport through physical walls
                # (keeps the chain exactly conservative; the discrete
                # metric's radial leakage otherwise drains ~1e-9/step)
                interior = (g.face_bctag[:, faces] == 0)[..., None, None]
                hyM = jnp.where(interior, hyM, 0.0)
                hyP = jnp.where(interior, hyP, 0.0)
            f2star = self.nf2(bl, nrm, qM, gfM, auxM, qP, gfP, auxP,
                              t, hyM, hyP)
            # model-prescribed boundary diffusive fluxes (reference
            # numerical_boundary_flux_second_order!, e.g. DragLaw /
            # BulkFormulaEnergy surface fluxes)
            if hasattr(bl, "boundary_flux_second_order"):
                bctag = g.face_bctag[:, faces]
                for tag in g.elem_bctags:
                    fb = bl.boundary_flux_second_order(
                        tag, nrm, qM, gfM, auxM, t)
                    if fb is not None:
                        f2star = jnp.where((bctag == tag)[..., None, None],
                                           fb, f2star)
            fstar = fstar + f2star

        sM = g.sM[:, faces, :, None]
        tendency = tendency - self._lift(sM * fstar, faces)

        if use_scalar_hyper:
            tendency = tendency + self._scalar_hyper_correction(
                q, aux, F2, faces)

        # source
        tendency = tendency + bl.source(q, gf, aux, t)
        if self.remainder is not None:
            tendency = tendency - self.remainder[0].source(q, gf, aux, t)
        return tendency, aux


def remainder_DGModel(dg_full, dg_lin):
    """Fused full − linear DG RHS (reference remainder.jl:37 RemBL +
    remainder_DGModel): one DGModel whose volume/interface/source pass
    subtracts the linear subcomponent in its own direction — exactly the
    two-call difference ``dg_full(q) − dg_lin(q)`` with half the face
    traffic."""
    return DGModel(dg_full.balance_law, dg_full.grid,
                   numerical_flux_first_order=dg_full.nf1,
                   numerical_flux_gradient=dg_full.nfg,
                   numerical_flux_second_order=dg_full.nf2,
                   direction=dg_full.direction,
                   diffusion_direction=dg_full.diffusion_direction,
                   update_aux=dg_full.update_aux,
                   exchange=dg_full.exchange,
                   remainder=(dg_lin.balance_law, dg_lin.direction),
                   row_halo=dg_full.row_halo,
                   **dg_full.kernel_opts)


# --- state creation / initialization ----------------------------------------

def create_state(balance_law, grid, state_type, dtype=None):
    """Allocate a zero state array [E, Np, n] (reference create_states.jl:3)."""
    n = balance_law.num_state(state_type)
    dtype = dtype or grid.coords.dtype
    return jnp.zeros((grid.nelem, grid.Np, n), dtype=dtype)


def init_state_auxiliary(balance_law, grid):
    """Aux with coord fields filled + model nodal init
    (reference SpaceDiscretization.jl:246)."""
    aux = create_state(balance_law, grid, st.Auxiliary())
    spec = balance_law.vars_state(st.Auxiliary())
    names = spec.flattened_names()
    if "coord[0]" in names or "coord" in [n.split("[")[0] for n in names]:
        ncoord = grid.coords.shape[-1]
        aux = aux.at[..., spec.index("coord")].set(grid.coords[..., :ncoord])
    geom = {"coords": grid.coords, "J": grid.J, "JcV": grid.JcV,
            "M": grid.M, "Nq": grid.Nq, "xi_x": grid.xi_x}
    return balance_law.nodal_init_state_auxiliary(geom, aux)


def init_ode_state(dg: DGModel, t0=0.0):
    """(q0, aux0) from the balance law's initial condition
    (reference SpaceDiscretization.jl:79 init_ode_state)."""
    bl, grid = dg.balance_law, dg.grid
    aux = init_state_auxiliary(bl, grid)
    q = bl.init_state_prognostic(grid.coords, aux, t0)
    aux = bl.update_auxiliary_state(grid, q, aux, t0)
    return q, aux
