"""Sub-dissection of the var-major surface pass at bench scale:
extraction matmul / trace build / neighbor gather / ghost+flux / lift."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg.fast_rhs import VarMajorRHS
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
    g = dg.grid
    E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
    X = nface * Nfp

    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)
    _HI = jax.lax.Precision.HIGHEST

    def meas(name, body, x0, lo=2, hi=10):
        ms = titer(lambda: body, x0, k_lo=lo, k_hi=hi)
        print(f"{name:26s}: {ms:7.2f} ms", flush=True)
        return ms

    eps = 1e-12
    bl, ps = vm.bl, vm.bl.param_set
    nq = vm.nq
    tab = vm._stab

    # replicate the B build
    subtract = bl.ref_state.subtract_off
    parts = [qv, p[:, None, :], c_s[:, None, :]]
    parts.append(vm._aux(auxv2, "ref_state.p")[:, None, :])
    phi = auxv2[:, vm.i_phi, :]
    rhoe_r = vm._aux(auxv2, "ref_state.rhoe")
    rho_r = vm._aux(auxv2, "ref_state.rho")
    T_r = vm._aux(auxv2, "ref_state.T")
    coeff = (rhoe_r + vm._aux(auxv2, "ref_state.p")) / rho_r - phi
    cl = jnp.sqrt((ps.cp_d / ps.cv_d) * ps.R_d * T_r)
    B0 = jnp.concatenate(parts + [phi[:, None, :], coeff[:, None, :],
                                  cl[:, None, :]], axis=1)
    nvb0 = B0.shape[1]
    ngl = gl2.shape[2]
    nX = 3 * ngl + 2
    B = jnp.concatenate([B0, gl2.reshape(E, 3 * ngl, Np), nu], axis=1)
    print(f"nvb0={nvb0} nX={nX} width={B.shape[1]}")

    def b_extract(y):
        Bx = jnp.matmul(y[0].reshape(E * (nvb0 + nX), Np), g.lift,
                        precision=_HI).reshape(E, nvb0 + nX, X)
        return (y[0] * (1 + eps * Bx[0, 0, 0]),)
    meas("extract matmul (all)", b_extract, (B,))

    Bx = jnp.matmul(B.reshape(E * (nvb0 + nX), Np), g.lift,
                    precision=_HI).reshape(E, nvb0 + nX, X)
    nrm = g.normals.transpose(0, 3, 1, 2).reshape(E, 3, X)

    # trace build (s-lanes)
    def b_trace(y):
        Bxl = y[0]
        Bf = Bxl[:, :nvb0]
        gl2f = Bxl[:, nvb0:nvb0 + 3 * ngl].reshape(E, 3, ngl, X)
        nu4f = Bxl[:, nvb0 + 3 * ngl]
        nu4qf = Bxl[:, nvb0 + 3 * ngl + 1]
        G = jnp.sum(nrm[:, :, None, :] * gl2f, axis=1)
        rhoF = Bf[:, 0]
        rnu = rhoF * nu4f
        s_list = [jnp.zeros_like(rhoF)]
        for j in range(3):
            s_list.append(rnu * G[:, j])
        s_list.append(nu4f * sum(Bf[:, 1 + j] * G[:, j] for j in range(3))
                      + rnu * G[:, 3])
        Bfull = jnp.concatenate([Bf, jnp.stack(s_list, axis=1)], axis=1)
        return (y[0] * (1 + eps * Bfull[0, 0, 0]),)
    meas("trace build", b_trace, (Bx,))

    nvb = nvb0 + nq
    Bf = Bx[:, :nvb0]
    Bf = jnp.concatenate([Bf, Bf[:, :nq]], axis=1)  # stand-in s lanes

    def b_gather(y):
        Bfy = y[0]
        blocks = []
        for f in range(nface):
            o = int(tab["opp"][f])
            src = Bfy[:, :, o * Nfp:(o + 1) * Nfp]
            blk = src[tab["nbr_e"][f]]
            for fsrc, rows, src_e in tab["fix"][f]:
                fixed = Bfy[src_e][:, :, fsrc * Nfp:(fsrc + 1) * Nfp]
                blk = blk.at[rows].set(fixed)
            blocks.append(blk)
        BP = jnp.concatenate(blocks, axis=2)
        return (y[0] * (1 + eps * BP[0, 0, 0]),)
    meas("neighbor gather", b_gather, (Bf,))

    blocks = []
    for f in range(nface):
        o = int(tab["opp"][f])
        src = Bf[:, :, o * Nfp:(o + 1) * Nfp]
        blk = src[tab["nbr_e"][f]]
        for fsrc, rows, src_e in tab["fix"][f]:
            fixed = Bf[src_e][:, :, fsrc * Nfp:(fsrc + 1) * Nfp]
            blk = blk.at[rows].set(fixed)
        blocks.append(blk)
    BP0 = jnp.concatenate(blocks, axis=2)
    sM = g.sM.reshape(E, 1, X)
    bmask = tab["bnd_lane"][:, None, :]
    i_pref = nq + 2

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
        return Fn, jnp.abs(un) + Bs[:, nq + 1]

    def b_flux(y):
        BP = y[0]
        run = sum(BP[:, 1 + c] * nrm[:, c] for c in range(3))
        ghost = [BP[:, 0]]
        for c in range(3):
            ghost.append(BP[:, 1 + c] - 2 * run * nrm[:, c])
        ghost = jnp.stack(ghost + [BP[:, v] for v in range(4, nvb)], axis=1)
        BP = jnp.where(bmask, ghost, BP)
        FnM, cM = flux_n(Bf)
        FnP, cP = flux_n(BP)
        c = jnp.maximum(cM, cP)
        fstar = jnp.stack([0.5 * (FnM[v] + FnP[v])
                           - 0.5 * c * (BP[:, v] - Bf[:, v])
                           for v in range(nq)], axis=1)
        return (y[0] * (1 + eps * fstar[0, 0, 0]),)
    meas("ghost+flux", b_flux, (BP0,))

    fstar = jnp.ones((E, nq, X), jnp.float32)

    def b_lift(y):
        lifted = jnp.matmul((sM * y[0]).reshape(E * nq, X), g.lift.T,
                            precision=_HI).reshape(E, nq, Np)
        out = -(g.MI[:, None, :] * lifted)
        return (y[0] * (1 + eps * out[0, 0, 0]),)
    meas("lift", b_lift, (fstar,))


if __name__ == "__main__":
    main()
