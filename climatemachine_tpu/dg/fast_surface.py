"""Var-major fast surface pass for the dry-Euler hot path.

Scope of reference ``DGModel_kernels.jl dgsem_interface_tendency!``
(:588) for the dominant benchmark configuration (dry compressible
AtmosModel, Rusanov flux, impenetrable free-slip / insulating walls —
the Held-Suarez setup).

Why a specialized path: the generic surface pass materializes
``[E, nface, Nfp, nvars]`` face tensors whose narrow trailing axis is
(8,128)-tile padded on TPU — every elementwise flux op then runs at
nvars/128 lane utilization and each layout change is a relayout copy
(measured ~15 ms of a 48 ms Held-Suarez p4 RHS).  This path keeps face
data VAR-MAJOR ``[E, nvb, nface·Nfp]`` (lanes = 150 → one 256 tile):

- face extraction: ONE ``[(E·nvb), Np] @ [Np, nface·Nfp]`` MXU matmul
  against the 0/1 lift matrix (the fmask scatter transposed),
- neighbor side: per-face contiguous lane slice of the OPPOSITE face
  block + one row gather over elements (structured-mesh fast path);
  panel-edge faces whose neighbor presents a different face index are
  fixed up with small static row-index scatters,
- boundary ghosts, Rusanov, and the lift all run per-variable on
  ``[E, 150]`` tiles; the lift is one ``[(E·n), 150] @ [150, Np]``
  matmul; a single transpose returns the node-major tendency.

Gated by :func:`supports`; the generic XLA path remains for everything
else.  Orientation permutations must be identity (true for this
topology builder's grids — asserted at table build).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def supports(dg) -> bool:
    """True when this kernel reproduces the generic surface pass
    exactly for dg's configuration."""
    from climatemachine_tpu.atmos.model import AtmosModel
    from climatemachine_tpu.atmos.moisture import DryModel
    from climatemachine_tpu.atmos import boundaryconditions as abc
    from climatemachine_tpu.dg.numerical_fluxes import RusanovNumericalFlux

    bl, g = dg.balance_law, dg.grid
    if not isinstance(bl, AtmosModel):
        return False
    ph = bl.physics
    if not (g.dim == 3 and dg.direction == "every"
            and g.face_perm_identity):
        return False
    # single-device: static neighbor tables from face_nbr_row; sharded:
    # an all-faces row halo must be provided (parallel/sharded.py)
    all_faces = tuple(range(g.nface))
    if dg.exchange is None and g.face_nbr_row is not None:
        pass
    elif all_faces in dg.row_halo:
        pass
    else:
        return False
    # fused remainder (IMEX explicit stage): the gathered face states and
    # lift are identical; only the linear acoustic(-gravity) Rusanov flux
    # is subtracted on the linear model's faces (reference remainder.jl:37)
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
    if not (bl.prog_spec.num == 5 and isinstance(ph.moisture, DryModel)
            and not ph.energy.is_theta
            and not ph.compressibility.is_anelastic
            and ph.turbconv is None and bl.tracers.N == 0
            and ph.turbulence is None and ph.sgstke is None
            and ph.radiation is None):
        return False
    if type(dg.nf1) is not RusanovNumericalFlux:
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


def _tables(dg):
    """Static neighbor tables (host numpy, cached on the DGModel)."""
    tab = dg._rows_cache.get("fast_surface")
    if tab is not None:
        return tab
    g = dg.grid
    E, nface = g.nelem, g.nface
    if g.face_nbr_row is None:
        # sharded: neighbor side rides the row halo; only the boundary
        # mask is needed (face_bctag is np-static per shard pattern)
        bnd = np.asarray(g.face_bctag) != 0
        tab = {"bnd_lane": jnp.asarray(np.repeat(bnd, g.Nfp_max, axis=1))}
        dg._rows_cache["fast_surface"] = tab
        return tab
    nbr_row = np.asarray(g.face_nbr_row)          # [E, nface]
    nbr_e = nbr_row // nface
    nbr_f = nbr_row % nface
    opp = np.arange(nface) ^ 1
    tab = {"nbr_e": [], "fix": []}
    for f in range(nface):
        tab["nbr_e"].append(jnp.asarray(nbr_e[:, f], dtype=jnp.int32))
        # panel-edge fixups: neighbor presents a face other than opp(f)
        fixes = []
        bad = nbr_f[:, f] != opp[f]
        for fsrc in np.unique(nbr_f[bad, f]):
            rows = np.where(bad & (nbr_f[:, f] == fsrc))[0]
            fixes.append((int(fsrc), jnp.asarray(rows, dtype=jnp.int32),
                          jnp.asarray(nbr_e[rows, f], dtype=jnp.int32)))
        tab["fix"].append(fixes)
    tab["opp"] = opp
    bnd = np.asarray(g.face_bctag) != 0           # [E, nface]
    tab["bnd_lane"] = jnp.asarray(np.repeat(bnd, g.Nfp_max, axis=1))
    dg._rows_cache["fast_surface"] = tab
    return tab


def surface_tendency(dg, q, aux, t):
    """−M⁻¹ L (sM · f*₁) for the supported dry config: [E, Np, 5]."""
    bl, g = dg.balance_law, dg.grid
    ps = bl.param_set
    E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
    X = nface * Nfp
    tab = _tables(dg)

    Phi = bl.aux_get(aux, "orientation.Phi")                 # [E, Np]
    subtract = bl.ref_state.subtract_off
    rem = dg.remainder
    p_ref = (bl.aux_get(aux, "ref_state.p") if (subtract or rem is not None)
             else jnp.zeros_like(Phi))

    # var-major bundle [E, nvb, Np]: 5 prognostic + Phi + p_ref
    # (+ ref rhoe/rho/T for the remainder's linear flux subtraction)
    parts = [q.transpose(0, 2, 1), Phi[:, None, :], p_ref[:, None, :]]
    if rem is not None:
        for name in ("rhoe", "rho", "T"):
            parts.append(bl.aux_get(aux, "ref_state." + name)[:, None, :])
    B = jnp.concatenate(parts, axis=1)
    nvb = B.shape[1]
    HI = jax.lax.Precision.HIGHEST
    # face extraction: one MXU matmul against the 0/1 lift matrix
    Bf = jnp.matmul(B.reshape(E * nvb, Np), g.lift,
                    precision=HI).reshape(E, nvb, X)

    halo = dg.row_halo.get(tuple(range(nface)))
    if halo is not None:
        # sharded: one row-space gather through the face-row halo
        R2 = (Bf.reshape(E, nvb, nface, Nfp).transpose(0, 2, 1, 3)
              .reshape(E * nface, nvb * Nfp))
        BP = (halo.gather(R2).reshape(E, nface, nvb, Nfp)
              .transpose(0, 2, 1, 3).reshape(E, nvb, X))
    else:
        # neighbor side: per-face opposite-block slice + element row gather
        blocks = []
        for f in range(nface):
            o = int(tab["opp"][f])
            src = Bf[:, :, o * Nfp:(o + 1) * Nfp]
            blk = src[tab["nbr_e"][f]]
            for fsrc, rows, src_e in tab["fix"][f]:
                fixed = Bf[src_e][:, :, fsrc * Nfp:(fsrc + 1) * Nfp]
                blk = blk.at[rows].set(fixed)
            blocks.append(blk)
        BP = jnp.concatenate(blocks, axis=2)                 # [E, nvb, X]

    # geometry in var-major lanes
    nrm = g.normals.transpose(0, 3, 1, 2).reshape(E, 3, X)
    sM = g.sM.reshape(E, 1, X)
    bmask = tab["bnd_lane"][:, None, :]                      # [E, 1, X] bool

    # boundary ghost (Impenetrable FreeSlip + Insulating + Impermeable):
    # reflect the normal momentum, copy everything else
    run = sum(BP[:, 1 + c] * nrm[:, c] for c in range(3))    # uses BP=BM
    ghost = [BP[:, 0]]
    for c in range(3):
        ghost.append(BP[:, 1 + c] - 2 * run * nrm[:, c])
    ghost = jnp.stack(ghost + [BP[:, v] for v in range(4, nvb)], axis=1)
    # (on boundary faces the gathered neighbor IS the minus side)
    BP = jnp.where(bmask, ghost, BP)

    def flux_n(Bs):
        """Rusanov ingredients per side: (Fn[5], c, qvars[5])."""
        rho, ru1, ru2, ru3, rhoe, phi, pr = (Bs[:, i] for i in range(7))
        inv = 1.0 / rho
        u1, u2, u3 = ru1 * inv, ru2 * inv, ru3 * inv
        e_int = (rhoe - 0.5 * (ru1 * u1 + ru2 * u2 + ru3 * u3)) * inv - phi
        T = ps.T_0 + e_int / ps.cv_d
        p = rho * ps.R_d * T
        p_eff = p - pr if subtract else p
        un = u1 * nrm[:, 0] + u2 * nrm[:, 1] + u3 * nrm[:, 2]
        run_ = rho * un
        h = rhoe + p
        Fn = (run_,
              ru1 * un + p_eff * nrm[:, 0],
              ru2 * un + p_eff * nrm[:, 1],
              ru3 * un + p_eff * nrm[:, 2],
              h * un)
        c = jnp.abs(un) + jnp.sqrt((ps.cp_d / ps.cv_d) * ps.R_d * T)
        return Fn, c

    FnM, cM = flux_n(Bf)
    FnP, cP = flux_n(BP)
    c = jnp.maximum(cM, cP)
    fstar = jnp.stack([0.5 * (FnM[v] + FnP[v])
                       - 0.5 * c * (BP[:, v] - Bf[:, v])
                       for v in range(5)], axis=1)           # [E, 5, X]

    if rem is not None:
        # subtract the linear acoustic(-gravity) Rusanov flux on the
        # linear model's faces — same gathered states, contiguous lane
        # slice in the var-major X layout (reference remainder.jl:37;
        # linear flux at linear.jl:54-67, wavespeed c(T_ref) :72-75)
        from climatemachine_tpu.atmos.linear import \
            AtmosAcousticGravityLinearModel
        from climatemachine_tpu.dg.spatial import direction_faces
        lin, ldir = rem
        lfaces = direction_faces(ldir, 3)
        sl = slice(lfaces[0] * Nfp, (lfaces[-1] + 1) * Nfp)
        nrm_s = nrm[:, :, sl]
        gravity = isinstance(lin, AtmosAcousticGravityLinearModel)

        def flux_lin(Bs):
            rho, ru1, ru2, ru3, rhoe, phi = (Bs[:, i, sl] for i in range(6))
            p_r, rhoe_r, rho_r, T_r = (Bs[:, i, sl] for i in range(6, 10))
            pL = rho * ps.R_d * ps.T_0 + ps.R_d / ps.cv_d * (rhoe - rho * phi)
            coeff = (rhoe_r + p_r) / rho_r
            if not gravity:
                coeff = coeff - phi
            un = (ru1 * nrm_s[:, 0] + ru2 * nrm_s[:, 1]
                  + ru3 * nrm_s[:, 2])
            Fn = (un, pL * nrm_s[:, 0], pL * nrm_s[:, 1],
                  pL * nrm_s[:, 2], coeff * un)
            cl = jnp.sqrt((ps.cp_d / ps.cv_d) * ps.R_d * T_r)
            return Fn, cl

        FnLM, cLM = flux_lin(Bf)
        FnLP, cLP = flux_lin(BP)
        cl = jnp.maximum(cLM, cLP)
        fstar_lin = jnp.stack(
            [0.5 * (FnLM[v] + FnLP[v])
             - 0.5 * cl * (BP[:, v, sl] - Bf[:, v, sl])
             for v in range(5)], axis=1)
        fstar = fstar.at[:, :, sl].add(-fstar_lin)

    lifted = jnp.matmul((sM * fstar).reshape(E * 5, X), g.lift.T,
                        precision=HI).reshape(E, 5, Np)
    return -(g.MI[:, None, :] * lifted).transpose(0, 2, 1)
