"""Held-Suarez dry GCM (reference experiments/AtmosGCM/heldsuarez.jl).

Cubed-sphere dry dynamical core with HS94 relaxation forcing::

    python examples/heldsuarez.py --n-horz 4 --n-vert 3 --timeend 600
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-horz", type=int, default=4)
    p.add_argument("--n-vert", type=int, default=3)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--timeend", type=float, default=600.0)
    p.add_argument("--imex", action="store_true",
                   help="HEVI IMEX (ARK2 GKC + columnwise solve)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg = held_suarez_config(n_horz=args.n_horz, n_vert=args.n_vert,
                             poly_order=args.poly, dtype=np.float32)
    dc = cm.DriverConfiguration(object(), "heldsuarez", args.poly,
                                cfg.grid, cfg.model)
    solver_type = cm.IMEXSolverType() if args.imex \
        else cm.ExplicitSolverType()
    sc = cm.make_solver_configuration(
        0.0, args.timeend, dc, ode_solver_type=solver_type,
        Courant_number=0.3)
    # the reference's every-step exponential filter on perturbations
    # (heldsuarez.jl:261-273) — required for long-run stability; fused
    # into the compiled step via the post_step hook
    from climatemachine_tpu.experiments.held_suarez import \
        HeldSuarezStepFilter
    hsf = HeldSuarezStepFilter(cfg.grid, cfg.model)
    sc.solver.post_step = hsf.apply_vm if getattr(sc.solver, "vm", None) is not None \
        else hsf.apply
    print(f"dt = {sc.dt:.2f} s, elements = {cfg.grid.nelem}, "
          f"solver = {'IMEX' if args.imex else 'explicit LSRK'}")
    ratio = cm.invoke(sc)
    print(f"norm(Q)/norm(Q0) = {ratio:.6f}")


if __name__ == "__main__":
    main()
