"""Piecewise A/B of the round-5 surface kernels: extract+trace kernel
alone vs its XLA counterpart, and flux+lift kernel alone vs XLA, with a
block_e sweep."""
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
    from climatemachine_tpu.dg.pallas_surface import (
        extract_trace_vm, fused_surface_lift_vm)

    cfg = held_suarez_config(n_horz=16, n_vert=8, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    vm = VarMajorRHS(dg)
    g = dg.grid
    qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
    E, Np, nface, Nfp = g.nelem, g.Np, g.nface, g.Nfp_max
    X = nface * Nfp
    nq = vm.nq
    ps = vm.bl.param_set

    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    gl2, nu = vm._chain(qv, auxv2, T, p, 0.0)
    ngl = gl2.shape[2]
    gl2k = gl2.reshape(E, 3 * ngl, Np)
    phi = auxv2[:, vm.i_phi, :]
    p_ref = vm._aux(auxv2, "ref_state.p")
    coeff = (vm._aux(auxv2, "ref_state.rhoe") + p_ref) / \
        vm._aux(auxv2, "ref_state.rho") - phi
    cl = jnp.sqrt((ps.cp_d / ps.cv_d) * ps.R_d * vm._aux(auxv2,
                                                         "ref_state.T"))
    aux4 = jnp.stack([p_ref, phi, coeff, cl], axis=1)
    na = 4
    nrm = g.normals.transpose(0, 3, 1, 2).reshape(E, 3, X)
    eps = 1e-12

    for be in (16, 32, 64, 128):
        def body(y):
            Bf = extract_trace_vm(y[0], p, c_s, aux4, gl2k, nu, g.lift,
                                  nrm, nq=nq, na=na, ngl=ngl,
                                  has_hyper=True, block_e=be,
                                  interpret=False)
            return (y[0] * (1 + eps * Bf[0, 0, 0]),)
        print(f"kernelA be={be:4d}: {titer(lambda: body, (qv,)):6.2f} ms",
              flush=True)

    nvb = nq + 2 + na + nq
    Bf = extract_trace_vm(qv, p, c_s, aux4, gl2k, nu, g.lift, nrm,
                          nq=nq, na=na, ngl=ngl, has_hyper=True,
                          block_e=32, interpret=False)
    BP = vm._gather_faces(Bf, nvb)
    sM = g.sM.reshape(E, 1, X)
    bmask = vm._stab["bnd_lane"][:, None, :].astype(Bf.dtype)
    from climatemachine_tpu.dg.spatial import direction_faces
    lfaces = direction_faces(vm.rem[1], 3)
    sl_lo, sl_hi = lfaces[0] * Nfp, (lfaces[-1] + 1) * Nfp

    for be in (16, 32, 64, 128):
        def bodyB(y):
            out = fused_surface_lift_vm(
                y[0], BP, nrm, sM, bmask, g.lift.T, g.MI,
                nq=nq, nvb=nvb, subtract=True, i_pref=nq + 2,
                has_hyper=True, rem_lanes=(nq + 3, nq + 4, nq + 5),
                sl_lo=sl_lo, sl_hi=sl_hi,
                R_d_T0=float(ps.R_d * ps.T_0),
                R_over_cv=float(ps.R_d / ps.cv_d),
                block_e=be, interpret=False)
            return (y[0] * (1 + eps * out[0, 0, 0]),)
        print(f"kernelB be={be:4d}: {titer(lambda: bodyB, (Bf,)):6.2f} ms",
              flush=True)

    def b_gather(y):
        BPx = vm._gather_faces(y[0], nvb)
        return (y[0] * (1 + eps * BPx[0, 0, 0]),)
    print(f"gather (16 lanes): {titer(lambda: b_gather, (Bf,)):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
