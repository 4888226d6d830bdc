"""End-to-end var-major RHS for the atmosphere hot path (round 4).

Scope: the full DG RHS of reference ``DGModel.jl:85`` for dry AND
EquilMoist compressible AtmosModel configurations without a turbulence
closure (Held-Suarez, baroclinic wave, moist baroclinic wave) — the
benchmark family.

Why: the generic RHS keeps state node-major ``[E, Np, nvar]``.  On TPU
the trailing variable axis (5-6) maps to the 128-lane tile, so every
elementwise pass and every layout change runs at nvar/128 lane
utilization (a single 31 MB state transpose measures ~3.2 ms at
benchmark scale — scripts/tpu_applyop_dissect.py).  This path keeps
EVERYTHING var-major ``[E, nvar, Np]`` (lanes = Np) from the time
integrator's state through every intermediate:

- **thermo once**: T, p, sound speed (and the EquilMoist saturation
  adjustment) are computed once per RHS and reused by the volume flux,
  the face fluxes (faces are nodal subsets, so face thermo = extracted
  volume thermo), and the sources — the generic path recomputes them
  4x per evaluation.
- **volume**: one fused Pallas kernel (pallas_volume.fused_volume
  _tendency_vm) computes first-order flux + hyperdiffusive flux +
  optional fused-remainder subtraction + weak divergence entirely in
  VMEM; only q/p/F2/metrics are read and only the tendency is written.
- **chain**: the var-major LDG chain (ldg_varmajor) is driven directly
  in var-major (no node-major boundary transposes).
- **surface**: generic-width var-major Rusanov pass; p and c ride the
  face bundle so no thermo is evaluated on faces.
- **sources**: ``contributions_vm`` hooks on the source objects.

The tendency returned is var-major; the ODE integrators are layout
agnostic (axpy), so whole explicit steps and the ARK stage algebra run
without a single state transpose.  Gated by :func:`supports`; parity
with the generic DGModel is enforced at round-off by
tests/test_fast_rhs.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg import ldg_varmajor as _lvm

_HI = jax.lax.Precision.HIGHEST


def supports(dg) -> bool:
    """True when VarMajorRHS reproduces the generic RHS exactly for this
    configuration."""
    from climatemachine_tpu.atmos.model import AtmosModel
    from climatemachine_tpu.atmos.moisture import DryModel, EquilMoist
    from climatemachine_tpu.atmos import boundaryconditions as abc
    from climatemachine_tpu.dg.numerical_fluxes import RusanovNumericalFlux

    bl, g = dg.balance_law, dg.grid
    if not isinstance(bl, AtmosModel):
        return False
    ph = bl.physics
    if not (g.dim == 3 and dg.direction == "every"
            and g.face_perm_identity and g.Wdiv is not None):
        return False
    if len(set(int(x) for x in g.Nq)) != 1:
        return False                         # ldg tables need uniform Nq
    all_faces = tuple(range(g.nface))
    if dg.exchange is None and getattr(g, "face_nbr_row", None) is not None:
        pass
    elif all_faces in dg.row_halo:
        pass
    else:
        return False
    if not isinstance(ph.moisture, (DryModel, EquilMoist)):
        return False
    if (ph.energy.is_theta or ph.compressibility.is_anelastic
            or ph.turbulence is not None or ph.turbconv is not None
            or ph.sgstke is not None or ph.radiation is not None
            or ph.lsforcing is not None or bl.tracers.N != 0):
        return False
    if ph.precipitation is not None and \
            ph.precipitation.vars_prognostic().num:
        return False
    hd = ph.hyperdiffusion
    if hd is not None:
        from climatemachine_tpu.atmos.hyperdiffusion import (
            DryBiharmonic, EquilMoistBiharmonic)
        if type(hd) not in (DryBiharmonic, EquilMoistBiharmonic):
            return False
        if isinstance(ph.moisture, EquilMoist) != isinstance(
                hd, EquilMoistBiharmonic):
            return False
    if type(dg.nf1) is not RusanovNumericalFlux:
        return False
    if dg.remainder is not None:
        from climatemachine_tpu.atmos.linear import (
            AtmosAcousticGravityLinearModel, AtmosAcousticLinearModel)
        lin, ldir = dg.remainder
        if type(lin) not in (AtmosAcousticGravityLinearModel,
                             AtmosAcousticLinearModel):
            return False
        if ldir not in ("vertical", "every"):
            return False
        if bl.ref_state is None:
            return False
    for src in bl.sources:
        if not hasattr(src, "contributions_vm"):
            return False
    for bc in bl.problem.boundary_conditions:
        if type(bc) is not abc.AtmosBC:
            return False
        mom = bc.momentum
        if isinstance(mom, abc.Impenetrable):
            mom = mom.bc
        if type(mom) is not abc.FreeSlip:
            return False
        if type(bc.energy) is not abc.Insulating:
            return False
        if type(bc.moisture) is not abc.Impermeable:
            return False
    return True


@dataclass
class VMContext:
    """What the var-major source hooks see (arrays [E, Np] for scalars,
    [E, 3, Np] for vectors; ``aux(name)`` pulls var-major aux slices)."""
    rho: object
    rhou: object
    rhoe: object
    T: object
    p: object
    Phi: object
    grad_Phi: object
    coords: object
    aux: object     # callable name -> array


class VarMajorRHS:
    """Var-major full RHS; call signature ``(qv, auxv, t) -> (dqv, auxv')``
    with qv [E, nq, Np] and auxv [E, naux, Np]."""

    def __init__(self, dg, interpret: Optional[bool] = None,
                 block_e: int = 32, chain_kernel: str = "auto",
                 chain_block_e: int = 32):
        assert supports(dg), "unsupported configuration for VarMajorRHS"
        from climatemachine_tpu.atmos.moisture import EquilMoist
        # "pallas": the fused 4-kernel chain (dg/pallas_ldg.chain_vm)
        # instead of the per-pass XLA chain.  Hardware A/B at bench
        # scale (scripts/tpu_chain_ab_vm.py, both orders, 2 repeats):
        # RHS 20.3 -> 15.3 ms, LSRK54 step 106 -> 90 ms under identical
        # load — the fused chain WINS inside the var-major step (the
        # round-3 loss was against the generic node-major composition).
        # "auto" = pallas on TPU, per-pass XLA elsewhere/under halos.
        if chain_kernel == "auto":
            chain_kernel = ("pallas" if jax.default_backend() == "tpu"
                            else "xla")
        self.chain_kernel = chain_kernel
        self.chain_block_e = chain_block_e
        # fused post-gather surface flux + lift kernel
        # (dg/pallas_surface.py) stays OPT-IN: the hardware A/B
        # (scripts/out/surface_ab_vm.log) measured the full RHS at
        # 19.8 ms with it vs 15.3 ms without under identical load — the
        # surface pass is elementwise work XLA already fuses around the
        # gather, and the kernel boundary forces Bf/BP materialization
        # the XLA path avoids.  Parity-tested either way.
        self.surface_kernel = "xla"
        self.dg = dg
        self.bl = dg.balance_law
        self.grid = dg.grid
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        g = self.grid
        E = g.nelem
        while E % block_e != 0:
            block_e //= 2
        self.block_e = block_e
        bl = self.bl
        self.nq = bl.prog_spec.num
        self.moist = isinstance(bl.physics.moisture, EquilMoist)
        # see _thermo_update: solver_types turns this off for the
        # integrated dry path; export_aux refreshes at loop exit
        self.thermo_writes_aux = True
        sp = bl.aux_spec
        self.i_phi = sp.index("orientation.Phi").start
        self.i_gphi = sp.index("orientation.grad_Phi")
        self.i_coord = sp.index("coord")
        self._aux_idx = {}          # name -> slice (resolved lazily)
        self.hd = bl.physics.hyperdiffusion
        self.rem = dg.remainder
        if self.rem is not None:
            from climatemachine_tpu.atmos.linear import \
                AtmosAcousticGravityLinearModel
            self.lin_gravity = isinstance(self.rem[0],
                                          AtmosAcousticGravityLinearModel)
        # prebuild static face tables while the grid is concrete
        from climatemachine_tpu.dg.spatial import (direction_dims,
                                                   direction_faces)
        self.all_faces = tuple(range(g.nface))
        self.dims_every = direction_dims("every", 3)
        if self.hd is not None:
            cdir = bl.hyperdiffusion_direction or dg.diffusion_direction
            self.chain_dims = direction_dims(cdir, 3)
            self.chain_faces = direction_faces(cdir, 3)
            ngl = bl.gradlap_spec.num
            _lvm._tables(dg, self.chain_faces, ngl)
            _lvm._tables(dg, self.all_faces, self.nq)
        self._surf_tables()

    # --- layout converters ---------------------------------------------------
    def to_vm(self, q):
        return q.transpose(0, 2, 1)

    def from_vm(self, qv):
        return qv.transpose(0, 2, 1)

    aux_to_vm = to_vm
    aux_from_vm = from_vm

    # --- aux access ------------------------------------------------------------
    def _aux(self, auxv, name):
        sl = self._aux_idx.get(name)
        if sl is None:
            sl = self.bl.aux_spec.index(name)
            self._aux_idx[name] = sl
        out = auxv[:, sl, :]
        return out[:, 0, :] if (sl.stop - sl.start) == 1 else out

    # --- thermo (once per RHS) -------------------------------------------------
    def _thermo_update(self, qv, auxv, t):
        """T, p, c_s (+ aux refresh) — reference nodal
        update_auxiliary_state! (AtmosModel.jl:859-877) fused with the
        thermo recomputation every flux/source pass would redo.

        DRY + ``thermo_writes_aux=False`` (the solver-integrated mode,
        set by driver/solver_types): the air_T/theta_v lane writes are
        SKIPPED — they are pure functions of q that nothing inside the
        step reads (T and p are passed explicitly to every consumer),
        and writing them makes aux loop-variant, which costs two full
        aux-array copies per RHS plus per-lane async slice-copies of
        every aux read inside the compiled step (~15 ms/step at bench
        scale, round-5 trace scripts/tpu_explicit_trace.py).  The lanes
        are refreshed at export boundaries instead
        (:meth:`export_aux`, called by SolveState/from_internal).
        Moist configurations always write (the saturation-adjustment
        lanes may be consumed by sources/diagnostics mid-step)."""
        from climatemachine_tpu.physics import thermodynamics as td
        bl, ps = self.bl, self.bl.param_set
        rho = qv[:, 0, :]
        ru = qv[:, 1:4, :]
        rhoe = qv[:, 4, :]
        Phi = auxv[:, self.i_phi, :]
        e_int = (rhoe - 0.5 * jnp.sum(ru * ru, axis=1) / rho) / rho - Phi
        sp = bl.aux_spec
        if self.moist:
            q_tot = qv[:, 5, :] / rho
            T = td.saturation_adjustment(
                ps, e_int, rho, q_tot,
                n_iter=bl.physics.moisture.maxiter)
            pp = td.phase_partition_equil(ps, T, rho, q_tot)
            p = td.air_pressure(ps, T, rho, pp)
            theta_v = td.virtual_temperature(ps, T, pp) * \
                (ps.MSLP / p) ** ps.kappa_d
            for name, val in (("moisture.temperature", T),
                              ("moisture.theta_v", theta_v),
                              ("moisture.q_liq", pp.liq),
                              ("moisture.q_ice", pp.ice)):
                auxv = auxv.at[:, sp.index(name).start, :].set(val)
            c_s = td.soundspeed_air(ps, T, pp)
        else:
            T = td.air_temperature(ps, e_int)
            p = td.air_pressure(ps, T, rho)
            c_s = td.soundspeed_air(ps, T)
            if self.thermo_writes_aux:
                theta_v = T * (ps.MSLP / p) ** ps.kappa_d
                auxv = auxv.at[:, sp.index("moisture.air_T").start,
                               :].set(T)
                auxv = auxv.at[:, sp.index("moisture.theta_v").start,
                               :].set(theta_v)
        return T, p, c_s, auxv

    def export_aux(self, qv, auxv):
        """Refresh the deferred thermo aux lanes before aux leaves the
        integration loop (no-op unless ``thermo_writes_aux`` is off)."""
        if self.thermo_writes_aux:
            return auxv
        writes, self.thermo_writes_aux = self.thermo_writes_aux, True
        try:
            _, _, _, auxv = self._thermo_update(qv, auxv, 0.0)
        finally:
            self.thermo_writes_aux = writes
        return auxv

    # --- hyperdiffusion chain ----------------------------------------------------
    def _chain(self, qv, auxv, T, p, t):
        """Var-major LDG chain (reference DGModel.jl:226-310): returns
        (gl2 [E, 3, ngl, Np], nu [E, 2, Np]) — the ∇Δ of (u_h, h_tot
        [, q_tot]) and the (ν₄, ν₄_q) coefficients.  The hyperdiffusive
        FLUX is never materialized: the volume kernel builds it in VMEM
        and the surface pass builds its n·F₂ trace from extracted
        lanes."""
        bl, g, dg = self.bl, self.grid, self.dg
        ps = bl.param_set
        rho = qv[:, 0, :]
        ru = qv[:, 1:4, :]
        rhoe = qv[:, 4, :]
        u = ru / rho[:, None, :]
        k = auxv[:, self.i_gphi, :] / ps.grav            # [E, 3, Np]
        u_h = u - jnp.sum(u * k, axis=1, keepdims=True) * k
        h_tot = (rhoe + p) / rho
        parts = [u_h, h_tot[:, None, :]]
        if self.moist:
            parts.append((qv[:, 5, :] / rho)[:, None, :])
        glv = jnp.concatenate(parts, axis=1)             # [E, ngl, Np]
        ngl = glv.shape[1]

        faces, dims = self.chain_faces, self.chain_dims
        halo = dg.row_halo.get(faces)
        if self.chain_kernel == "pallas" and halo is None:
            from climatemachine_tpu.dg import pallas_ldg as _pldg
            gl2 = _pldg.chain_vm(dg, glv, dims, faces,
                                 interpret=self.interpret,
                                 block_e=self.chain_block_e)
        else:
            tab = _lvm._tables(dg, faces, ngl)
            geom = _lvm._geom(dg, faces, dims)
            grad = _lvm.grad_vm(dg, glv, tab, geom, dims, halo)
            lap = _lvm.div_vm(dg, grad, tab, geom, dims, halo)
            gl2 = _lvm.grad_vm(dg, lap, tab, geom, dims, halo)  # [E,3,ngl,Np]

        delta = self._aux(auxv, "hyperdiffusion.delta")
        nu4 = (delta / 2) ** 4 / (2 * self.hd.tau_timescale)
        if self.moist:
            nu4q = (delta / 2) ** 4 / (2 * self.hd.tau_timescale_q_tot)
        else:
            nu4q = jnp.zeros_like(nu4)
        return gl2, jnp.stack([nu4, nu4q], axis=1)

    # --- surface ----------------------------------------------------------------
    def _surf_tables(self):
        """Neighbor/boundary tables (host numpy; reuses fast_surface's)."""
        from climatemachine_tpu.dg import fast_surface as _fs
        self._stab = _fs._tables(self.dg)

    def _gather_faces(self, Bf, nvb):
        """Neighbor exchange of a face bundle [E, nvb, X] (row halo under
        shard_map, static tables single-device)."""
        g, dg, tab = self.grid, self.dg, self._stab
        E, nface, Nfp = g.nelem, g.nface, g.Nfp_max
        halo = dg.row_halo.get(self.all_faces)
        if halo is not None:
            R2 = (Bf.reshape(E, nvb, nface, Nfp).transpose(0, 2, 1, 3)
                  .reshape(E * nface, nvb * Nfp))
            return (halo.gather(R2).reshape(E, nface, nvb, Nfp)
                    .transpose(0, 2, 1, 3).reshape(E, nvb, nface * Nfp))
        blocks = []
        for f in range(nface):
            o = int(tab["opp"][f])
            src = Bf[:, :, o * Nfp:(o + 1) * Nfp]
            blk = src[tab["nbr_e"][f]]
            for fsrc, rows, src_e in tab["fix"][f]:
                fixed = Bf[src_e][:, :, fsrc * Nfp:(fsrc + 1) * Nfp]
                blk = blk.at[rows].set(fixed)
            blocks.append(blk)
        return jnp.concatenate(blocks, axis=2)

    def _surface_pallas(self, qv, auxv, p, c_s, t, hyper):
        """Two-kernel surface pass: extract+trace in VMEM -> XLA face
        gather -> flux+lift in VMEM.  Same math as the XLA path below;
        only the gathered bundle and its exchange touch HBM between the
        volume state and the lifted tendency."""
        from climatemachine_tpu.dg.pallas_surface import \
            fused_surface_lift_vm
        bl, g = self.bl, self.grid
        ps = bl.param_set
        E, nface, Nfp = g.nelem, g.nface, g.Nfp_max
        nq, rem = self.nq, self.rem
        subtract = bl.ref_state.subtract_off
        na = len(self._aux_lanes(auxv))
        nrm = g.normals.transpose(0, 3, 1, 2).reshape(E, 3, nface * Nfp)
        Bf, nvb = self._bundle_pallas(qv, auxv, p, c_s, hyper)
        BP = self._gather_faces(Bf, nvb)

        sM = g.sM.reshape(E, 1, nface * Nfp)
        bmask = self._stab["bnd_lane"][:, None, :]
        rem_lanes = ()
        sl_lo = sl_hi = 0
        if rem is not None:
            from climatemachine_tpu.dg.spatial import direction_faces
            nvb0 = nq + 2 + na
            rem_lanes = (nvb0 - 3, nvb0 - 2, nvb0 - 1)
            lfaces = direction_faces(rem[1], 3)
            sl_lo, sl_hi = lfaces[0] * Nfp, (lfaces[-1] + 1) * Nfp
        return fused_surface_lift_vm(
            Bf, BP, nrm, sM, bmask.astype(Bf.dtype), g.lift.T, g.MI,
            nq=nq, nvb=nvb, subtract=subtract,
            i_pref=nq + 2 if (subtract or rem is not None) else nq,
            has_hyper=hyper is not None, rem_lanes=rem_lanes,
            sl_lo=sl_lo, sl_hi=sl_hi,
            R_d_T0=float(ps.R_d * ps.T_0),
            R_over_cv=float(ps.R_d / ps.cv_d),
            block_e=self.block_e, interpret=self.interpret)

    def _aux_lanes(self, auxv):
        """Minus-side auxiliary face-bundle lanes: p_ref (+ the linear
        model's phi / energy coeff / soundspeed when a fused remainder
        is configured)."""
        bl, ps, rem = self.bl, self.bl.param_set, self.rem
        lanes = []
        if bl.ref_state.subtract_off or rem is not None:
            lanes.append(self._aux(auxv, "ref_state.p"))
        if rem is not None:
            phi = auxv[:, self.i_phi, :]
            coeff = (self._aux(auxv, "ref_state.rhoe") + lanes[0]) \
                / self._aux(auxv, "ref_state.rho")
            if not self.lin_gravity:
                coeff = coeff - phi
            cl = jnp.sqrt((ps.cp_d / ps.cv_d) * ps.R_d
                          * self._aux(auxv, "ref_state.T"))
            lanes += [phi, coeff, cl]
        return lanes

    def _bundle_pallas(self, qv, auxv, p, c_s, hyper):
        """Face bundle via the fused extract+trace kernel."""
        from climatemachine_tpu.dg.pallas_surface import extract_trace_vm
        g = self.grid
        E, Np, nq = g.nelem, g.Np, self.nq
        aux_lanes = self._aux_lanes(auxv)
        na = len(aux_lanes)
        aux4 = (jnp.stack(aux_lanes, axis=1) if na
                else jnp.zeros((E, 1, Np), qv.dtype))
        if hyper is not None:
            gl2, nu = hyper
            ngl = gl2.shape[2]
            gl2k = gl2.reshape(E, 3 * ngl, Np)
        else:
            ngl = 1
            gl2k = jnp.zeros((E, 3, Np), qv.dtype)
            nu = jnp.zeros((E, 2, Np), qv.dtype)
        nrm = g.normals.transpose(0, 3, 1, 2).reshape(
            E, 3, g.nface * g.Nfp_max)
        Bf = extract_trace_vm(qv, p, c_s, aux4, gl2k, nu, g.lift, nrm,
                              nq=nq, na=na, ngl=ngl,
                              has_hyper=hyper is not None,
                              block_e=self.block_e,
                              interpret=self.interpret)
        return Bf, nq + 2 + na + (nq if hyper is not None else 0)

    def _bundle_xla(self, qv, auxv, p, c_s, hyper, nrm):
        """Face bundle via XLA: B concat -> extraction matmul -> trace
        lanes (reference dgsem_interface_tendency! minus-side staging,
        DGModel_kernels.jl:588)."""
        g = self.grid
        E, Np, nq = g.nelem, g.Np, self.nq
        X = g.nface * g.Nfp_max
        parts = ([qv, p[:, None, :], c_s[:, None, :]]
                 + [a[:, None, :] for a in self._aux_lanes(auxv)])
        B = jnp.concatenate(parts, axis=1)               # [E, nvb, Np]
        nvb = B.shape[1]
        nX = 0
        ngl = 0
        if hyper is not None:
            gl2, nu = hyper
            ngl = gl2.shape[2]
            nX = 3 * ngl + 2
            B = jnp.concatenate(
                [B, gl2.reshape(E, 3 * ngl, Np), nu], axis=1)
        Bx = jnp.matmul(B.reshape(E * (nvb + nX), Np), g.lift,
                        precision=_HI).reshape(E, nvb + nX, X)
        Bf = Bx[:, :nvb]
        if hyper is not None:
            # scalar n·F₂ trace from the extracted chain lanes: each
            # side contracts ITS OWN volume F₂ with its outward normal;
            # only the nq trace lanes ride the gather
            gl2f = Bx[:, nvb:nvb + 3 * ngl].reshape(E, 3, ngl, X)
            nu4f = Bx[:, nvb + 3 * ngl]
            nu4qf = Bx[:, nvb + 3 * ngl + 1]
            G = jnp.sum(nrm[:, :, None, :] * gl2f, axis=1)   # [E, ngl, X]
            rhoF = Bf[:, 0]
            rnu = rhoF * nu4f
            s_list = [jnp.zeros_like(rhoF)]
            for j in range(3):
                s_list.append(rnu * G[:, j])
            s_list.append(nu4f * sum(Bf[:, 1 + j] * G[:, j]
                                     for j in range(3)) + rnu * G[:, 3])
            if nq > 5:
                s_list.append(rhoF * nu4qf * G[:, 4])
            Bf = jnp.concatenate([Bf, jnp.stack(s_list, axis=1)], axis=1)
        return Bf, nvb

    def _surface(self, qv, auxv, p, c_s, t, hyper=None):
        if self.surface_kernel == "pallas":
            return self._surface_pallas(qv, auxv, p, c_s, t, hyper)
        """Generic-width var-major Rusanov surface pass: −M⁻¹L(sM·f*).
        Faces are nodal subsets, so face thermo (p, c) is EXTRACTED, not
        recomputed (reference dgsem_interface_tendency!,
        DGModel_kernels.jl:588).

        With ``hyper = (gl2, nu)`` the hyper-only second-order interface
        correction is FUSED in: the chain-output lanes ride the same
        extraction matmul, the n·F₂ trace is built on the face tiles,
        its scalar exchange rides the same neighbor gather, and the
        combined face term rides one lift (one bundle, one gather, one
        lift — the reference's generic second-order interface pass,
        DGModel_kernels.jl:588 second-order part)."""
        bl, g, dg = self.bl, self.grid, self.dg
        ps = bl.param_set
        E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
        X = nface * Nfp
        nq = self.nq
        tab = self._stab
        rem = self.rem

        subtract = bl.ref_state.subtract_off
        nrm = g.normals.transpose(0, 3, 1, 2).reshape(E, 3, X)
        sM = g.sM.reshape(E, 1, X)
        bmask = tab["bnd_lane"][:, None, :]
        i_pref = nq + 2
        if self.surface_kernel == "hybrid":
            # Pallas extract+trace (hardware A/B: 0.78 ms vs ~2.3 ms for
            # the XLA B-build + extraction + trace materializations at
            # bench scale, scripts/tpu_surface_ab3.py), XLA gather +
            # flux + lift (the full flux+lift kernel LOSES on hardware —
            # scripts/out/surface_ab_vm.log and surface_ab2.log)
            Bf, nvb = self._bundle_pallas(qv, auxv, p, c_s, hyper)
            if hyper is not None:
                nvb -= nq       # code below re-adds the s-lane count
        else:
            Bf, nvb = self._bundle_xla(qv, auxv, p, c_s, hyper, nrm)
        if hyper is not None:
            nvb += nq           # trace lanes ride the bundle + gather

        BP = self._gather_faces(Bf, nvb)

        # boundary ghost: reflect normal momentum, copy everything else
        # (Impenetrable(FreeSlip) + Insulating + Impermeable; T/p/c are
        # invariant under the reflection)
        run = sum(BP[:, 1 + c] * nrm[:, c] for c in range(3))
        ghost = [BP[:, 0]]
        for c in range(3):
            ghost.append(BP[:, 1 + c] - 2 * run * nrm[:, c])
        ghost = jnp.stack(ghost + [BP[:, v] for v in range(4, nvb)], axis=1)
        BP = jnp.where(bmask, ghost, BP)

        def flux_n(Bs):
            rho = Bs[:, 0]
            inv = 1.0 / rho
            un = sum(Bs[:, 1 + c] * inv * nrm[:, c] for c in range(3))
            pv = Bs[:, nq]
            p_eff = pv - Bs[:, i_pref] if subtract else pv
            Fn = [rho * un]
            for c in range(3):
                Fn.append(Bs[:, 1 + c] * un + p_eff * nrm[:, c])
            Fn.append((Bs[:, 4] + pv) * un)
            for v in range(5, nq):
                Fn.append(Bs[:, v] * un)
            return Fn, jnp.abs(un) + Bs[:, nq + 1]

        FnM, cM = flux_n(Bf)
        FnP, cP = flux_n(BP)
        c = jnp.maximum(cM, cP)
        fstar = jnp.stack([0.5 * (FnM[v] + FnP[v])
                           - 0.5 * c * (BP[:, v] - Bf[:, v])
                           for v in range(nq)], axis=1)

        if hyper is not None:
            # fused hyper interface correction: +0.5(s⁻ − s⁺) on interior
            # faces rides the same lift (same math as the generic
            # _scalar_hyper_correction; wall faces carry no transport)
            sl_h = slice(nvb - nq, nvb)
            d2 = jnp.where(bmask, 0.0,
                           0.5 * (Bf[:, sl_h] - BP[:, sl_h]))
            fstar = fstar + d2

        if rem is not None:
            from climatemachine_tpu.dg.spatial import direction_faces
            lin, ldir = rem
            lfaces = direction_faces(ldir, 3)
            sl = slice(lfaces[0] * Nfp, (lfaces[-1] + 1) * Nfp)
            nrm_s = nrm[:, :, sl]
            nvb0 = nvb - (nq if hyper is not None else 0)
            i_lphi, i_lco, i_lcl = nvb0 - 3, nvb0 - 2, nvb0 - 1

            def flux_lin(Bs):
                rho, rhoe, phi = Bs[:, 0, sl], Bs[:, 4, sl], Bs[:, i_lphi, sl]
                pL = (rho * ps.R_d * ps.T_0
                      + ps.R_d / ps.cv_d * (rhoe - rho * phi))
                un = sum(Bs[:, 1 + c, sl] * nrm_s[:, c] for c in range(3))
                Fn = [un, pL * nrm_s[:, 0], pL * nrm_s[:, 1],
                      pL * nrm_s[:, 2], Bs[:, i_lco, sl] * un]
                Fn += [jnp.zeros_like(un)] * (nq - 5)
                return Fn, Bs[:, i_lcl, sl]

            FnLM, cLM = flux_lin(Bf)
            FnLP, cLP = flux_lin(BP)
            cl = jnp.maximum(cLM, cLP)
            fstar_lin = jnp.stack(
                [0.5 * (FnLM[v] + FnLP[v])
                 - 0.5 * cl * (BP[:, v, sl] - Bf[:, v, sl])
                 for v in range(nq)], axis=1)
            fstar = fstar.at[:, :, sl].add(-fstar_lin)

        lifted = jnp.matmul((sM * fstar).reshape(E * nq, X), g.lift.T,
                            precision=_HI).reshape(E, nq, Np)
        return -(g.MI[:, None, :] * lifted)

    # --- sources ------------------------------------------------------------------
    def _sources(self, qv, auxv, T, p, t):
        bl = self.bl
        ctx = VMContext(rho=qv[:, 0, :], rhou=qv[:, 1:4, :],
                        rhoe=qv[:, 4, :], T=T, p=p,
                        Phi=auxv[:, self.i_phi, :],
                        grad_Phi=auxv[:, self.i_gphi, :],
                        coords=auxv[:, self.i_coord, :],
                        aux=lambda name: self._aux(auxv, name))
        out = jnp.zeros_like(qv)
        for src in bl.sources:
            for name, val in src.contributions_vm(bl, ctx, t).items():
                sl = bl.prog_spec.index(name)
                if val.ndim == 2:
                    val = val[:, None, :]
                out = out.at[:, sl, :].add(val)
        return out

    # --- full RHS --------------------------------------------------------------------
    def __call__(self, qv, auxv, t):
        bl, g = self.bl, self.grid
        ps = bl.param_set
        T, p, c_s, auxv = self._thermo_update(qv, auxv, t)

        hyper = None
        if self.hd is not None:
            hyper = self._chain(qv, auxv, T, p, t)   # (gl2, nu)

        # volume (+ in-VMEM hyper flux divergence + fused remainder)
        from climatemachine_tpu.dg.pallas_volume import \
            fused_volume_tendency_vm
        subtract = bl.ref_state.subtract_off
        phi = auxv[:, self.i_phi, :]
        if subtract or self.rem is not None:
            p_ref = self._aux(auxv, "ref_state.p")
        else:
            p_ref = jnp.zeros_like(phi)
        lin_dims = ()
        lin_gravity = True
        if self.rem is not None:
            from climatemachine_tpu.dg.spatial import direction_dims
            lin_dims = direction_dims(self.rem[1], 3)
            lin_gravity = self.lin_gravity
            ref3 = jnp.stack([self._aux(auxv, "ref_state.rhoe"),
                              self._aux(auxv, "ref_state.rho"), p_ref],
                             axis=1)
        else:
            ref3 = jnp.zeros((g.nelem, 3, g.Np), dtype=qv.dtype)
        nq = self.nq
        if hyper is not None:
            gl2, nu = hyper
            ngl = gl2.shape[2]
            gl2k = gl2.reshape(g.nelem, 3 * ngl, g.Np)
        else:
            ngl = 1
            gl2k = jnp.zeros((g.nelem, 3, g.Np), dtype=qv.dtype)
            nu = jnp.zeros((g.nelem, 2, g.Np), dtype=qv.dtype)
        xiv = g.xi_x.transpose(0, 2, 3, 1).reshape(g.nelem, 9, g.Np)
        tend = fused_volume_tendency_vm(
            qv, p, phi, p_ref, ref3, gl2k, nu, xiv, g.M, g.MI, g.Wdiv,
            nq=nq, ngl=ngl, R_d=ps.R_d, cv_d=ps.cv_d, T_0=ps.T_0,
            block_e=self.block_e, subtract_ref=subtract,
            has_f2=hyper is not None, lin_dims=lin_dims,
            lin_gravity=lin_gravity, interpret=self.interpret)

        # surface (with the hyper interface correction fused) + sources
        tend = tend + self._surface(qv, auxv, p, c_s, t, hyper=hyper)
        tend = tend + self._sources(qv, auxv, T, p, t)
        if self.rem is not None and self.lin_gravity:
            # subtract the linear model's gravity source −ρ∇Φ
            # (linear.py AtmosAcousticGravityLinearModel.source)
            gPhi = auxv[:, self.i_gphi, :]
            tend = tend.at[:, 1:4, :].add(qv[:, 0, None, :] * gPhi)
        return tend, auxv
