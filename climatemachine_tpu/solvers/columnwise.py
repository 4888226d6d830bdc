"""Columnwise implicit solvers for HEVI vertical operators.

Scope of reference ``src/Numerics/SystemSolvers/columnwise_lu_solver.jl``
(ManyColumnLU :14, banded assembly :782-:821, band_lu/forward/back kernels
:555-:704): the vertical implicit operator couples only nodes within one
vertical column (stacked-grid invariant), so the backward-Euler system is
many small independent solves.

Two TPU-first designs:

- ``BlockTridiagColumnSolver`` (the scalable default, reference parity
  with ManyColumnLU's banded memory footprint): the first-order vertical
  DG operator couples an element only to its two vertical neighbours, so
  in (element, node, var) column ordering the matrix is block-tridiagonal
  with block size nb = Nq_v·nvars.  Assembly probes the operator with a
  period-3 element comb (3·nb applications instead of Nv); factor/solve
  is a block-Thomas sweep of batched ``[ncol, nb, nb]`` MXU matmuls,
  O(ncol·n_vert·nb²) memory — the banded-LU scaling of the reference.

- ``ManyColumnSolver`` (dense; small-grid oracle): assembles the full
  per-column matrix by Nv basis probes and inverts it once per dt; each
  stage is one big batched matvec.  O(ncol·Nv²) memory — unusable at
  benchmark scale, kept as the correctness oracle for parity tests.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

# TPU numerics: the block factorization/substitution matmuls MUST run at
# full f32 (Precision.HIGHEST) — the platform default lowers f32 dots to
# bf16 multiplies, and an implicit vertical-acoustic solve carrying ~1e-3
# relative error destabilizes the IMEX step at benchmark scale (measured:
# Held-Suarez p4 nh=16 blows up at step ~45 with default precision,
# runs clean at HIGHEST).
_HI = jax.lax.Precision.HIGHEST


class ColumnLayout:
    """Maps grid state [E, Np, n] <-> column batch [ncol, Nv].

    Stacked grids order elements e = eh*n_vert + ev and nodes
    n = i + Nq1*(j + Nq2*k); a column is (eh, j, i) with Nv =
    n_vert*Nq3*nvars unknowns ordered (ev, k, var), bottom to top.
    """

    def __init__(self, grid, nvars: int):
        assert grid.n_vert is not None, "columnwise solve needs a stacked grid"
        self.nvars = nvars
        self.n_vert = grid.n_vert
        self.n_horz = grid.n_horz
        self.Nq = grid.Nq
        self.Np = grid.Np
        Nq1, Nq2, Nq3 = grid.Nq[0], grid.Nq[1], grid.Nq[2]
        self.ncol = self.n_horz * Nq2 * Nq1
        self.Nv = self.n_vert * Nq3 * nvars

    def to_columns(self, x):
        Nq1, Nq2, Nq3 = self.Nq
        xb = x.reshape(self.n_horz, self.n_vert, Nq3, Nq2, Nq1, self.nvars)
        xb = jnp.transpose(xb, (0, 3, 4, 1, 2, 5))   # [Eh, j, i, ev, k, v]
        return xb.reshape(self.ncol, self.Nv)

    def from_columns(self, xc):
        Nq1, Nq2, Nq3 = self.Nq
        xb = xc.reshape(self.n_horz, Nq2, Nq1, self.n_vert, Nq3, self.nvars)
        xb = jnp.transpose(xb, (0, 3, 4, 1, 2, 5))   # [Eh, ev, k, j, i, v]
        return xb.reshape(self.n_horz * self.n_vert, self.Np, self.nvars)

    def to_blocks(self, x):
        """[E, Np, n] -> [nv, nb, ncol] in ONE transpose (nb = (k, var),
        ncol = (Eh, j, i)) — the lanes-major layout the block-tridiag
        sweeps consume.  A to_columns + reshape/transpose chain costs a
        second full shuffle that XLA cannot cancel once math sits in
        between (measured 11.5 ms of pure data movement per apply_op at
        benchmark scale)."""
        Nq1, Nq2, Nq3 = self.Nq
        xb = x.reshape(self.n_horz, self.n_vert, Nq3, Nq2, Nq1, self.nvars)
        xb = jnp.transpose(xb, (1, 2, 5, 0, 3, 4))   # [ev, k, v, Eh, j, i]
        return xb.reshape(self.n_vert, Nq3 * self.nvars,
                          self.n_horz * Nq2 * Nq1)

    def from_blocks(self, yb):
        Nq1, Nq2, Nq3 = self.Nq
        xb = yb.reshape(self.n_vert, Nq3, self.nvars, self.n_horz, Nq2, Nq1)
        xb = jnp.transpose(xb, (3, 0, 1, 4, 5, 2))   # [Eh, ev, k, j, i, v]
        return xb.reshape(self.n_horz * self.n_vert, self.Np, self.nvars)


class VMColumnLayout:
    """ColumnLayout adapter for VAR-MAJOR grid states [E, nvars, Np]
    (dg/fast_rhs.py): same block layout [nv, (k, var), (Eh, j, i)], but
    the grid side never materializes the lane-padded trailing-variable
    form — the transpose source keeps Np-lanes tiles.

    On TPU the conversions run as Pallas kernels (solvers/
    pallas_layout.py): in isolation the XLA 6-D transpose costs ~0.8 ms
    per 31 MB state, but inside the compiled IMEX step XLA's layout
    assignment expands each conversion into bitcast-copy chains
    totalling ~15-25 ms/step at bench scale (round-5 trace,
    scripts/tpu_imex_trace.py); the kernels pin a single-pass DMA."""

    def __init__(self, layout: ColumnLayout, use_pallas=None):
        self._l = layout
        if use_pallas is None:
            import jax as _jax
            use_pallas = _jax.default_backend() == "tpu"
        self._pallas = use_pallas

    @property
    def _dims(self):
        l = self._l
        return (l.n_horz, l.n_vert, l.nvars, l.Nq[2],
                l.Nq[1] * l.Nq[0])

    def to_blocks(self, x):
        l = self._l
        Nq1, Nq2, Nq3 = l.Nq
        if self._pallas:
            from climatemachine_tpu.solvers.pallas_layout import \
                to_blocks_vm
            return to_blocks_vm(x, layout_dims=self._dims)
        xb = x.reshape(l.n_horz, l.n_vert, l.nvars, Nq3, Nq2, Nq1)
        xb = jnp.transpose(xb, (1, 3, 2, 0, 4, 5))   # [ev, k, v, Eh, j, i]
        return xb.reshape(l.n_vert, Nq3 * l.nvars, l.ncol)

    def from_blocks(self, yb):
        l = self._l
        Nq1, Nq2, Nq3 = l.Nq
        if self._pallas:
            from climatemachine_tpu.solvers.pallas_layout import \
                from_blocks_vm
            return from_blocks_vm(yb, layout_dims=self._dims)
        xb = yb.reshape(l.n_vert, Nq3, l.nvars, l.n_horz, Nq2, Nq1)
        xb = jnp.transpose(xb, (3, 0, 2, 1, 4, 5))   # [Eh, ev, v, k, j, i]
        return xb.reshape(l.n_horz * l.n_vert, l.nvars, l.Np)


class BlockTridiagColumnSolver:
    """Scalable columnwise solve of (I − α·dt·L) via block-Thomas
    (reference ManyColumnLU / band_lu!/band_forward!/band_back!,
    columnwise_lu_solver.jl:555-:821, at the same O(ncol·Nv·bw) memory).

    ``op(q) -> Lq`` must be linear, column-local, and couple at most
    adjacent vertical elements (any first-order vertical DG operator —
    the AtmosLinearModel family).  A wider stencil is detected at setup
    by a random-vector matvec check and raises.
    """

    # the solve is a direct factorization of the assembled operator, so
    # ARK can get the implicit tendency from ``apply_op`` (the same
    # operator as the solve — perfect IMEX consistency) without an extra
    # vertical DG evaluation (ode/ark.py).  NOTE: the algebraic identity
    # L·Qi = (Qi − rhs)/(γ·dt) is exact too but its f32 cancellation
    # noise ~eps·|Q|/(γ·dt) destabilizes the Held-Suarez IMEX step at
    # benchmark scale (same failure mode as the r2 bf16-dot incident);
    # the matvec has no cancellation.
    exact_linear_solve = True

    def __init__(self, op: Callable, layout: ColumnLayout, example_q,
                 check: bool = True):
        self.layout = layout
        self.op = op
        lay = layout
        nv = lay.n_vert
        nb = lay.Nq[2] * lay.nvars      # block = one element's column slab
        self.nb = nb
        dtype = example_q.dtype

        zero = jnp.zeros_like(example_q)
        self.b_cols = lay.to_blocks(op(zero))           # affine [nv, nb, ncol]

        # Period-3 comb probing: a unit vector at within-block index m of
        # every 3rd element; responses at element ev' disambiguate because
        # at most one probed element lies in {ev'-1, ev', ev'+1}.
        def probe(p):
            r = p // nb
            m = p % nb
            ev = jnp.arange(nv)
            col = jnp.where((ev[:, None] % 3 == r)
                            & (jnp.arange(nb)[None, :] == m), 1.0,
                            0.0).astype(dtype)          # [nv, nb]
            qc = jnp.broadcast_to(col.reshape(lay.Nv), (lay.ncol, lay.Nv))
            resp = lay.to_blocks(op(lay.from_columns(qc))) - self.b_cols
            return jnp.transpose(resp, (2, 0, 1))       # [ncol, nv, nb]

        R = jax.lax.map(probe, jnp.arange(3 * nb))       # [3nb, ncol, nv, nb]
        R = R.reshape(3, nb, lay.ncol, nv, nb)
        R = jnp.transpose(R, (0, 2, 3, 4, 1))            # [r, ncol, ev', row, m]

        # route responses into lower/diag/upper blocks: source element for
        # response row ev' under comb residue r is the unique ev in the
        # window with ev % 3 == r (host-side index computation)
        #
        # TPU layout: blocks are stored [nv, nb_j, nb_i, ncol] — the
        # big ncol axis LAST (lanes) and the CONTRACTION axis j leading.
        # In the natural [ncol, nv, nb, nb] layout every block matvec is
        # a batch of tiny 25×25 MXU dots whose contraction axis pads to
        # the 128-lane tile (~14x HBM inflation: measured 39 ms for a
        # 2.8 ms-of-light matvec).  With ncol on lanes and j leading the
        # contraction accumulates over contiguous [i, ncol] slabs —
        # measured 495-611 GB/s effective on v5e (vs 161 GB/s with j on
        # sublanes, 47 GB/s for the MXU form; scripts/tpu_bmv_micro.py)
        # — and f32 elementwise never downcasts to bf16 (the _HI
        # concern applies to MXU dots).
        blocks = {}
        for d in (-1, 0, 1):
            rows = []
            for ev in range(nv):
                src = ev + d
                if 0 <= src < nv:
                    rows.append(R[src % 3, :, ev])
                else:
                    rows.append(jnp.zeros((lay.ncol, nb, nb), dtype=dtype))
            blk = jnp.stack(rows, axis=1)                # [ncol, nv, i, j]
            blocks[d] = jnp.transpose(blk, (1, 3, 2, 0))  # [nv, j, i, ncol]
        self.L, self.D, self.U = blocks[-1], blocks[0], blocks[1]
        self._cached = {}

        # Inactive-unknown compression: block indices whose row AND
        # column vanish in every block (e.g. horizontal momentum under
        # the vertical acoustic-gravity linear model — 2 of 5 vars)
        # are solved trivially (q_m = rhs_m, incl. the αdt·b affine
        # part) and sliced OUT of the blocks: the streamed operator/
        # factor bytes drop by (s/nb)² (25→15 rows ⇒ 2.3 GB → 0.83 GB
        # at benchmark scale).
        import numpy as np
        pat = np.asarray(jnp.max(
            jnp.abs(self.L) + jnp.abs(self.D) + jnp.abs(self.U),
            axis=(0, 3)))                                # [nb, nb]
        active = (pat.max(axis=1) > 0) | (pat.max(axis=0) > 0)
        self._sel = np.flatnonzero(active)
        self._unsel = np.flatnonzero(~active)
        if 0 < len(self._sel) < nb:
            s = jnp.asarray(self._sel)
            comp = lambda B: B[:, s][:, :, s]
            self.Lc, self.Dc, self.Uc = map(comp, (self.L, self.D, self.U))
        else:
            self._sel = np.arange(nb)
            self._unsel = np.arange(0)
            self.Lc, self.Dc, self.Uc = self.L, self.D, self.U

        if check:
            # a wider-than-tridiagonal stencil (e.g. a second-order
            # implicit operator) would alias under the period-3 comb —
            # verify with a random matvec
            key = jax.random.PRNGKey(0)
            x = jax.random.normal(key, example_q.shape, dtype=dtype)
            got = self._matvec(lay.to_columns(x))
            want = lay.to_columns(op(x)) - self._unblk(self.b_cols)
            scale = float(jnp.max(jnp.abs(want))) + 1e-300
            tol = 1e-4 if dtype == jnp.float32 else 1e-10
            err = float(jnp.max(jnp.abs(got - want)))
            if err > tol * scale:
                raise ValueError(
                    "operator couples beyond adjacent vertical elements "
                    f"(matvec residual {err:.3e} vs scale {scale:.3e}); "
                    "use the dense ManyColumnSolver")

    def _blk(self, xc):
        """[ncol, Nv] -> [nv, nb, ncol] (ncol on lanes)."""
        xb = xc.reshape(self.layout.ncol, self.layout.n_vert, self.nb)
        return jnp.transpose(xb, (1, 2, 0))

    def _unblk(self, yb):
        """[nv, nb, ncol] -> [ncol, Nv]."""
        return jnp.transpose(yb, (2, 0, 1)).reshape(self.layout.ncol,
                                                    self.layout.Nv)

    @staticmethod
    def _bmv(M, v):
        """Block matvec in contraction-outer layout: M [.., j, i, ncol]
        · v [.., j, ncol] -> [.., i, ncol] as a fused VPU multiply-sum
        over contiguous [i, ncol] slabs (f32-exact; no MXU padding)."""
        return (M * v[..., :, None, :]).sum(-3)

    def _matvec(self, xc):
        xb = self._blk(xc)                               # [nv, nb, ncol]
        y = self._bmv(self.D, xb)
        y = y.at[1:].add(self._bmv(self.L[1:], xb[:-1]))
        y = y.at[:-1].add(self._bmv(self.U[:-1], xb[1:]))
        return self._unblk(y)

    def op_args(self, dtype=None):
        """Operator arrays for ``apply_op`` — pass through jit as
        ARGUMENTS (multi-GB; captured constants blow the remote-compile
        payload limit, same reason prefactorize factors are threaded).

        ``dtype=jnp.bfloat16`` halves the streamed operator bytes (the
        matvec is HBM-bound on the L/D/U blocks); the multiply-sum still
        accumulates in f32 (bf16·f32 promotes).  MEASURED round 5
        (scripts/tpu_bf16_op_ab.py): the ~3.4 ms/step win comes with a
        2.3e-2 max-relative state drift within 50 benchmark steps even
        on the ``rhs_full`` path — the final-update G cancellation is
        exact, but the bf16-perturbed G still shifts every stage
        prediction and Held-Suarez amplifies the perturbation at the
        baroclinic growth rate (same mechanism as the implied-G NOTE
        above, weaker constant).  That fails the bench precision gate's
        mean/std budgets, so bf16 stays OPT-IN and off by default; it is
        only validated at all for the ``rhs_full`` block path (without
        it, G feeds the final update directly with no cancellation —
        do not enable it there).  The affine part b stays full
        precision (it carries the hydrostatic background, whose error
        would NOT cancel)."""
        if dtype is None:
            return (self.Lc, self.Dc, self.Uc, self.b_cols)
        key = jnp.dtype(dtype).name
        if not hasattr(self, "_opargs_cache"):
            self._opargs_cache = {}
        if key not in self._opargs_cache:
            cast = lambda B: B.astype(dtype)
            self._opargs_cache[key] = (cast(self.Lc), cast(self.Dc),
                                       cast(self.Uc), self.b_cols)
        return self._opargs_cache[key]

    def apply_op_blocks(self, xb, args=None):
        """L·x + b entirely in block layout [nv, nb, ncol] — lets the
        ARK step keep implicit tendencies in the solver layout and skip
        the ~3.2 ms/31 MB grid<->block transposes (the dominant cost of
        the non-fused path; scripts/tpu_applyop_dissect.py)."""
        L, D, U, b = args if args is not None else self.op_args()
        full = len(self._sel) == self.nb
        xs = xb if full else xb[:, jnp.asarray(self._sel)]
        y = self._bmv(D, xs)
        y = y.at[1:].add(self._bmv(L[1:], xs[:-1]))
        y = y.at[:-1].add(self._bmv(U[:-1], xs[1:]))
        if not full:
            y = jnp.zeros_like(xb).at[:, jnp.asarray(self._sel)].set(y)
        return y + b

    def apply_op(self, q, args=None):
        """L·q + b via the assembled block-tridiagonal operator — the
        implicit tendency consistent with the solve (no DG
        evaluation)."""
        lay = self.layout
        return lay.from_blocks(self.apply_op_blocks(lay.to_blocks(q),
                                                    args))

    def _factor(self, alpha_dt: float):
        """Block-Thomas factorization of M = I − α·dt·A (reference
        band_lu_kernel!): store S⁻¹ (pivot-block inverses) and
        C = S⁻¹·U' so each stage solve is two nv-step batched sweeps.

        Runs once per dt (eager); internally uses the [.., s, s]
        square layout that jnp.linalg.inv needs, then transposes the
        results to the lanes-major [nv, i, j, ncol] layout the solve
        sweeps consume.  Operates on the ACTIVE-unknown compression
        (inactive rows solve trivially in ``solve``)."""
        s = len(self._sel)
        # [nv, j, i, ncol] -> [nv, ncol, i, j] for inv/matmul
        sq = lambda a: jnp.transpose(a, (0, 3, 2, 1))
        eye = jnp.eye(s, dtype=self.D.dtype)
        Dm = eye[None, None] - alpha_dt * sq(self.Dc)    # [nv, ncol, s, s]
        Lm = -alpha_dt * sq(self.Lc)
        Um = -alpha_dt * sq(self.Uc)

        def fwd(C_prev, ops):
            Dk, Lk, Uk = ops
            S = Dk - jnp.einsum("cij,cjk->cik", Lk, C_prev, precision=_HI)
            Sinv = jnp.linalg.inv(S)
            C = jnp.einsum("cij,cjk->cik", Sinv, Uk, precision=_HI)
            return C, (Sinv, C)

        C0 = jnp.zeros_like(Dm[0])
        _, (Sinv, C) = jax.lax.scan(fwd, C0, (Dm, Lm, Um))
        lanes = lambda a: jnp.transpose(a, (0, 3, 2, 1))
        return lanes(Sinv), lanes(C), lanes(Lm)          # [nv, j, i, ncol]

    def prefactorize(self, alpha_dt: float):
        """Factor eagerly (outside jit) — ESDIRK tableaus reuse one γ·dt
        for every stage so this runs once per dt (reference
        prefactorize / band_lu!)."""
        key = float(alpha_dt)
        if key not in self._cached:
            self._cached[key] = jax.tree.map(
                lambda a: a.block_until_ready(), self._factor(alpha_dt))
        return self._cached[key]

    def solve(self, rhs, alpha_dt, factors=None):
        """q s.t. (I − α·dt·L) q = rhs: block forward/back substitution
        (reference band_forward_kernel!/band_back_kernel!).

        Pass ``factors`` (from prefactorize) explicitly when calling
        under jit so multi-GB factor arrays enter as arguments rather
        than captured constants (the remote-compile path rejects huge
        constant-laden HLO)."""
        lay = self.layout
        fac = factors
        if fac is None:
            fac = self._cached.get(float(alpha_dt))
        if fac is None:
            fac = self._factor(alpha_dt)
        Sinv, C, Lm = fac                                # [nv, j, i, ncol]
        return lay.from_blocks(
            self.solve_blocks(lay.to_blocks(rhs), alpha_dt, factors=fac))

    def solve_blocks(self, rhs_b, alpha_dt, factors=None):
        """Block-layout variant of :meth:`solve`: rhs and solution in
        [nv, nb, ncol] (see apply_op_blocks)."""
        lay = self.layout
        fac = factors
        if fac is None:
            fac = self._cached.get(float(alpha_dt))
        if fac is None:
            fac = self._factor(alpha_dt)
        Sinv, C, Lm = fac
        rv = rhs_b + alpha_dt * self.b_cols              # [nv, nb, ncol]
        full = len(self._sel) == self.nb
        rs = rv if full else rv[:, jnp.asarray(self._sel)]
        bmv = self._bmv

        def fwd(y_prev, ops):
            Sinv_k, Lk, rk = ops
            y = bmv(Sinv_k, rk - bmv(Lk, y_prev))
            return y, y

        y0 = jnp.zeros_like(rs[0])
        _, ys = jax.lax.scan(fwd, y0, (Sinv, Lm, rs))

        def bwd(x_next, ops):
            Ck, yk = ops
            x = yk - bmv(Ck, x_next)
            return x, x

        _, xs = jax.lax.scan(bwd, jnp.zeros_like(ys[-1]), (C, ys),
                             reverse=True)                # [nv, s, ncol]
        # inactive rows have zero operator rows: q = rhs + αdt·b
        return xs if full else rv.at[:, jnp.asarray(self._sel)].set(xs)


class ManyColumnSolver:
    """Batched dense factor/apply of (I - α·dt·L) per column (reference
    ManyColumnLU + band_lu!; see module docstring for the TPU redesign).

    ``op(q) -> Lq`` must be linear + column-local (a vertical-direction
    DG RHS of an AtmosLinearModel).
    """

    exact_linear_solve = True   # direct inverse: see BlockTridiag note

    def op_args(self, dtype=None):
        if dtype is not None:
            # cache the cast (ark.step calls this once per HOST step;
            # re-casting would re-upload the multi-GB dense A each time)
            key = jnp.dtype(dtype).name
            if not hasattr(self, "_opargs_cache"):
                self._opargs_cache = {}
            if key not in self._opargs_cache:
                self._opargs_cache[key] = (self.A.astype(dtype),
                                           self.b_cols)
            return self._opargs_cache[key]
        return (self.A, self.b_cols)

    def apply_op(self, q, args=None):
        """L·q + b via the assembled dense operator (see BlockTridiag
        note): one batched matvec."""
        lay = self.layout
        A, b = args if args is not None else self.op_args()
        qc = lay.to_columns(q)
        yc = jnp.einsum("cij,cj->ci", A, qc, precision=_HI) + b
        return lay.from_columns(yc)

    def __init__(self, op: Callable, layout: ColumnLayout, example_q):
        self.layout = layout
        self.op = op
        lay = layout

        # affine part (should be ~0 for truly linear models; kept for
        # correctness of backward-Euler with affine BCs)
        zero = jnp.zeros_like(example_q)
        self.b_cols = lay.to_columns(op(zero))

        def probe(k):
            e = jnp.zeros((lay.Nv,), dtype=example_q.dtype).at[k].set(1.0)
            qk = lay.from_columns(
                jnp.broadcast_to(e, (lay.ncol, lay.Nv)))
            return lay.to_columns(op(qk)) - self.b_cols   # [ncol, Nv]

        cols = jax.lax.map(probe, jnp.arange(lay.Nv))     # [Nv, ncol, Nv]
        self.A = jnp.transpose(cols, (1, 2, 0))           # [ncol, Nv(out), Nv(in)]
        self._cached = {}

    def _factor(self, alpha_dt: float):
        lay = self.layout
        eye = jnp.eye(lay.Nv, dtype=self.A.dtype)
        return jnp.linalg.inv(eye[None] - alpha_dt * self.A)

    def prefactorize(self, alpha_dt: float):
        """Invert (I - α·dt·A) per column (reference prefactorize /
        band_lu!); call EAGERLY (outside jit) — ARK reuses one γ·dt for
        all stages so this happens once per dt."""
        key = float(alpha_dt)
        if key not in self._cached:
            self._cached[key] = self._factor(alpha_dt)
        return self._cached[key]

    def solve(self, rhs, alpha_dt, factors=None):
        """q s.t. (I - α·dt·L) q = rhs: one batched MXU matvec.

        Uses ``factors`` if given (see BlockTridiagColumnSolver.solve),
        else the eagerly-cached factorization when available; never
        caches under trace (would leak tracers)."""
        lay = self.layout
        Minv = factors
        if Minv is None:
            Minv = self._cached.get(float(alpha_dt))
        if Minv is None:
            Minv = self._factor(alpha_dt)
        r = lay.to_columns(rhs) + alpha_dt * self.b_cols
        qc = jnp.einsum("cij,cj->ci", Minv, r, precision=_HI)
        return lay.from_columns(qc)
