"""Device-honest profile of the IMEX north-star step components at
benchmark scale: remainder RHS, vertical linear RHS, block-tridiag
solve, assembled-operator matvec, full ARK2GKC step."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import titer  # noqa: E402


def main():
    from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
    from climatemachine_tpu.driver.solver_types import IMEXSolverType
    from climatemachine_tpu.experiments.held_suarez import held_suarez_config
    from climatemachine_tpu.mesh.grid import min_node_distance

    nh = int(os.environ.get("NH", "16"))
    nv = int(os.environ.get("NV", "8"))
    cfg = held_suarez_config(n_horz=nh, n_vert=nv, poly_order=4,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    dt = 0.1 * float(min_node_distance(cfg.grid, "horizontal")) / 350.0
    imex = IMEXSolverType().make(dg, q, aux, dt)
    sv = imex.solver
    print(f"nh={nh} nv={nv} dt={dt:.2f}s "
          f"surf={dg._fast_surface} vol={dg._pallas_volume}", flush=True)

    # full step
    def body_step():
        def body(y):
            qq, aa = y
            return imex.step(qq, aa, 0.0)
        return body
    ms = titer(body_step, (q, aux), k_lo=1, k_hi=4)
    print(f"IMEX ARK2GKC step : {ms:7.2f} ms", flush=True)

    # remainder RHS (the explicit stage work)
    rhs_ex = imex.rhs_ex
    def body_rem():
        def body(y):
            qq, aa = y
            dq, aa = rhs_ex(qq, aa, 0.0)
            return (dq, aa)
        return body
    ms = titer(body_rem, (q, aux), k_lo=1, k_hi=6)
    print(f"remainder RHS     : {ms:7.2f} ms", flush=True)

    # vertical linear RHS (stage-0 G path)
    rhs_im = imex.rhs_im
    def body_lin():
        def body(y):
            qq, aa = y
            dq, _ = rhs_im(qq, aa, 0.0)
            return (dq, aa)
        return body
    ms = titer(body_lin, (q, aux), k_lo=1, k_hi=6)
    print(f"vertical lin RHS  : {ms:7.2f} ms", flush=True)

    # solve (prefactorized)
    gam = float(sv.A_im[1, 1])
    fac = sv._factors()[gam]
    def body_solve():
        def body(y):
            return sv.solver.solve(y, gam * dt, factors=fac)
        return body
    ms = titer(body_solve, q, k_lo=1, k_hi=6)
    print(f"block-tridiag solve: {ms:6.2f} ms", flush=True)

    # assembled-operator matvec
    op_args = sv.solver.op_args()
    def body_op():
        def body(y):
            return sv.solver.apply_op(y, op_args)
        return body
    ms = titer(body_op, q, k_lo=1, k_hi=8)
    print(f"apply_op matvec   : {ms:7.2f} ms", flush=True)

    # full dg RHS (for comparison with the explicit bench)
    def body_full():
        def body(y):
            qq, aa = y
            dq, aa = dg(qq, aa, 0.0)
            return (dq, aa)
        return body
    ms = titer(body_full, (q, aux), k_lo=1, k_hi=6)
    print(f"full DG RHS       : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
