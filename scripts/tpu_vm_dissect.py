"""Device-honest per-pass dissection of the var-major RHS at bench scale."""
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
    E, Np, nq = g.nelem, g.Np, vm.nq

    T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)
    F2v = vm._hyper_F2(qv, auxv2, T, p, 0.0)

    def mk(fn):
        def make_body():
            def body(y):
                return fn(y)
            return body
        return make_body

    def meas(name, fn, x0, lo=2, hi=10):
        ms = titer(mk(fn), x0, k_lo=lo, k_hi=hi)
        print(f"{name:24s}: {ms:7.2f} ms", flush=True)

    # streaming calibration: 31 MB var-major state copy+scale
    meas("axpy qv (3x31MB)", lambda y: 1.0000001 * y + 1e-30, qv)

    meas("thermo+aux", lambda y: vm._thermo_update(y, auxv, 0.0)[0]
         [:, None, :] * jnp.ones((1, nq, 1), qv.dtype) * 1e-30 + y, qv)

    def chain_body(y):
        f2 = vm._hyper_F2(y, auxv2, T, p, 0.0)
        return y + 1e-30 * f2[:, 0]
    meas("chain+F2 build", chain_body, qv)

    from climatemachine_tpu.dg.pallas_volume import fused_volume_tendency_vm
    ps = dg.balance_law.param_set
    phi = auxv[:, vm.i_phi, :]
    p_ref = vm._aux(auxv, "ref_state.p")
    ref3 = jnp.zeros((E, 3, Np), dtype=qv.dtype)
    F2k = F2v.reshape(E, 3 * nq, Np)
    xiv = g.xi_x.transpose(0, 2, 3, 1).reshape(E, 9, Np)

    def vol_body(y):
        t = fused_volume_tendency_vm(
            y, p, phi, p_ref, ref3, F2k, xiv, g.M, g.MI, g.Wdiv,
            nq=nq, R_d=ps.R_d, cv_d=ps.cv_d, T_0=ps.T_0,
            block_e=vm.block_e, subtract_ref=True, has_f2=True,
            lin_dims=(), lin_gravity=True, interpret=False)
        return y + 1e-30 * t
    meas("volume kernel (w/ F2)", vol_body, qv)

    meas("surface", lambda y: y + 1e-30 * vm._surface(y, auxv2, p, c_s, 0.0),
         qv)
    meas("scalar hyper corr",
         lambda y: y + 1e-30 * vm._scalar_hyper_vm(
             F2v * (1 + 1e-30 * y[0, 0, 0]), vm.all_faces), qv)
    meas("sources", lambda y: y + 1e-30 * vm._sources(y, auxv2, T, p, 0.0),
         qv)
    meas("FULL vm RHS", lambda y: y + 1e-30 * vm(y, auxv, 0.0)[0], qv)


if __name__ == "__main__":
    main()
