"""Isolate the hybrid-surface regression: bundle kernel alone, bundle ->
gather, bundle -> gather -> flux, and the xla equivalents."""
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
    nq = vm.nq

    def m(name, body, x0=(qv,), lo=2, hi=10):
        print(f"{name:28s}: {titer(lambda: body, x0, k_lo=lo, k_hi=hi):6.2f}"
              " ms", flush=True)

    def b_bundle_p(y):
        Bf, nvb = vm._bundle_pallas(y[0], auxv2, p, c_s, hyper)
        return (y[0] * (1 + eps * Bf[0, 0, 0]),)
    m("bundle pallas", b_bundle_p)

    def b_bundle_x(y):
        g = vm.grid
        nrm = g.normals.transpose(0, 3, 1, 2).reshape(
            g.nelem, 3, g.nface * g.Nfp_max)
        Bf, nvb = vm._bundle_xla(y[0], auxv2, p, c_s, hyper, nrm)
        return (y[0] * (1 + eps * Bf[0, 0, 0]),)
    m("bundle xla", b_bundle_x)

    def b_bg_p(y):
        Bf, nvb = vm._bundle_pallas(y[0], auxv2, p, c_s, hyper)
        BP = vm._gather_faces(Bf, nvb)
        return (y[0] * (1 + eps * BP[0, 0, 0]),)
    m("bundle+gather pallas", b_bg_p)

    def b_bg_x(y):
        g = vm.grid
        nrm = g.normals.transpose(0, 3, 1, 2).reshape(
            g.nelem, 3, g.nface * g.Nfp_max)
        Bf, nvb = vm._bundle_xla(y[0], auxv2, p, c_s, hyper, nrm)
        BP = vm._gather_faces(Bf, nvb + nq)
        return (y[0] * (1 + eps * BP[0, 0, 0]),)
    m("bundle+gather xla", b_bg_x)


if __name__ == "__main__":
    main()
