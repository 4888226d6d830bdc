"""Where do the hybrid surface's 17 ms go?  Time each stage with the
producer inside vs outside the jit, full-sum consumption (no DCE)."""
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
    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)
    hyper = (gl2, nu)
    eps = 1e-12
    g = vm.grid
    E, Np, nq = g.nelem, g.Np, vm.nq
    X = g.nface * g.Nfp_max
    nrm = g.normals.transpose(0, 3, 1, 2).reshape(E, 3, X)

    def m(name, body, x0=(qv,), lo=2, hi=10):
        print(f"{name:30s}: {titer(lambda: body, x0, k_lo=lo, k_hi=hi):6.2f}"
              " ms", flush=True)

    def b_surf_hybrid(y):
        vm.surface_kernel = "hybrid"
        s = vm._surface(y[0], auxv2, p, c_s, 0.0, hyper=hyper)
        return (y[0] + eps * s,)
    m("surface hybrid (full)", b_surf_hybrid)

    def b_surf_xla(y):
        vm.surface_kernel = "xla"
        s = vm._surface(y[0], auxv2, p, c_s, 0.0, hyper=hyper)
        return (y[0] + eps * s,)
    m("surface xla (full)", b_surf_xla)

    # precompute pallas bundle + gather OUTSIDE, time flux-only
    Bf_p, nvb = vm._bundle_pallas(qv, auxv2, p, c_s, hyper)
    BP_p = vm._gather_faces(Bf_p, nvb)
    Bf_x, nvb_x = vm._bundle_xla(qv, auxv2, p, c_s, hyper, nrm)
    BP_x = vm._gather_faces(Bf_x, nvb_x + nq)
    sM = g.sM.reshape(E, 1, X)
    bmask = vm._stab["bnd_lane"][:, None, :]
    subtract = vm.bl.ref_state.subtract_off
    i_pref = nq + 2
    _HI = jax.lax.Precision.HIGHEST

    def flux(Bf, BP):
        run = sum(BP[:, 1 + c] * nrm[:, c] for c in range(3))
        ghost = [BP[:, 0]]
        for c in range(3):
            ghost.append(BP[:, 1 + c] - 2 * run * nrm[:, c])
        ghost = jnp.stack(ghost + [BP[:, v] for v in range(4, nvb)],
                          axis=1)
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
            return Fn, jnp.abs(un) + Bs[:, nq + 1]

        FnM, cM = flux_n(Bf)
        FnP, cP = flux_n(BP)
        c = jnp.maximum(cM, cP)
        fstar = jnp.stack([0.5 * (FnM[v] + FnP[v])
                           - 0.5 * c * (BP[:, v] - Bf[:, v])
                           for v in range(nq)], axis=1)
        sl_h = slice(nvb - nq, nvb)
        d2 = jnp.where(bmask, 0.0, 0.5 * (Bf[:, sl_h] - BP[:, sl_h]))
        fstar = fstar + d2
        lifted = jnp.matmul((sM * fstar).reshape(E * nq, X), g.lift.T,
                            precision=_HI).reshape(E, nq, Np)
        return -(g.MI[:, None, :] * lifted)

    def b_flux_from_p(y):
        qy, bf, bp = y
        s = flux(bf, bp)
        return (qy + eps * s, bf * (1 + eps * s[0, 0, 0]), bp)
    m("flux-only (pallas inputs)", b_flux_from_p, x0=(qv, Bf_p, BP_p))

    def b_flux_from_x(y):
        qy, bf, bp = y
        s = flux(bf, bp)
        return (qy + eps * s, bf * (1 + eps * s[0, 0, 0]), bp)
    m("flux-only (xla inputs)", b_flux_from_x, x0=(qv, Bf_x, BP_x))

    def b_hyb_nogather(y):
        qy, _, bp = y
        Bf, nvb2 = vm._bundle_pallas(qy, auxv2, p, c_s, hyper)
        s = flux(Bf, bp)
        return (qy + eps * s, Bf, bp)
    m("bundleP(live)+flux(fixedBP)", b_hyb_nogather, x0=(qv, Bf_p, BP_p))

    def b_hyb_copy(y):
        qy, _, bp = y
        Bf, nvb2 = vm._bundle_pallas(qy, auxv2, p, c_s, hyper)
        Bf = jnp.copy(Bf)
        s = flux(Bf, bp)
        return (qy + eps * s, Bf, bp)
    m("bundleP+COPY+flux(fixedBP)", b_hyb_copy, x0=(qv, Bf_p, BP_p))

    def b_hyb_reshape(y):
        qy, _, bp = y
        Bf, nvb2 = vm._bundle_pallas(qy, auxv2, p, c_s, hyper)
        Bf = Bf.reshape(E, nvb * X)[:, : nvb * X].reshape(E, nvb, X)
        s = flux(Bf, bp)
        return (qy + eps * s, Bf, bp)
    m("bundleP+RESHAPE+flux(fixed)", b_hyb_reshape, x0=(qv, Bf_p, BP_p))

    def b_hyb_all(y):
        Bf, nvb2 = vm._bundle_pallas(y[0], auxv2, p, c_s, hyper)
        BP = vm._gather_faces(Bf, nvb2)
        s = flux(Bf, BP)
        return (y[0] + eps * s,)
    m("bundleP+gather+flux (live)", b_hyb_all)


if __name__ == "__main__":
    main()
