"""Sweep the fused Pallas chain's element block size: at block_e=16 the
in-kernel dots carry only 64 sublane rows (half an MXU tile); 32/64
double/quadruple occupancy at still-tiny VMEM footprints.  Measures the
standalone chain and the full var-major RHS back-to-back."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    for be in (16, 32, 64, 128, 32, 16):
        vm = VarMajorRHS(dg, chain_kernel="pallas", chain_block_e=be)
        qv, auxv = vm.to_vm(q), vm.aux_to_vm(aux)
        T, p, c_s, auxv2 = vm._thermo_update(qv, auxv, 0.0)

        def body_chain():
            def body(y):
                gl2, nu = vm._chain(y, auxv2, T, p, 0.0)
                ngl = gl2.shape[2]
                return y.at[:, :ngl].add(1e-30 * gl2[:, 0])
            return body
        ms_c = titer(body_chain, qv, k_lo=2, k_hi=10)

        def body_rhs():
            def body(y):
                qq, aa = y
                tend, a2 = vm(qq, aa, 0.0)
                return (qq + 1e-30 * tend, a2)
            return body
        ms_r = titer(body_rhs, (qv, auxv), k_lo=2, k_hi=8)
        print(f"[block_e={be:3d}] chain: {ms_c:6.2f} ms   RHS: {ms_r:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
