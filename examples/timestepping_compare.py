"""Time-integrator comparison on one configuration (reference
tutorials/Numerics/TimeStepping/{ts_intro,explicit_lsrk,imex_ark,
multirate_rk,mis}.jl with tutorial_risingbubble_config.jl).

Runs the same small dry rising-bubble LES through the solver menu —
explicit LSRK (54/144), SSPRK33, IMEX ARK2+columnwise, multirate RK,
and MIS2 — to the same end time, and reports each solver's dt, step
count, RHS-evaluation count, and the max-norm difference against a
small-dt LSRK54 control: the tutorials' point that the split/implicit
schemes take 6-20x larger steps at small added error.  Smoke::

    python examples/timestepping_compare.py --timeend 10
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import min_node_distance
from climatemachine_tpu.ode.solve import (from_internal, solve,
                                          to_internal)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timeend", type=float, default=50.0)
    p.add_argument("--resolution", type=float, default=125.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 110.0)))

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        r = jnp.sqrt((x - 1250.0) ** 2 + (z - 1000.0) ** 2)
        dtheta = 2.0 * jnp.clip(1 - r / 500.0, 0.0, 1.0)
        T = (300.0 + dtheta) * (pr / ps.MSLP) ** ps.kappa_d
        rho = pr / (ps.R_d * T)
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (cm.td.internal_energy(ps, T) + Phi)},
            batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))
    # anisotropic grid (dz = dx/5): the every-direction acoustic limit
    # is VERTICAL, the regime the HEVI/multirate tutorials target
    dc = cm.AtmosLESConfiguration(
        "ts_compare", 4,
        (args.resolution, args.resolution, args.resolution / 5),
        2500.0, 2500.0, 2500.0, model, dtype=np.float64)
    dg = DGModel(dc.model, dc.grid)
    q0, aux0 = init_ode_state(dg)
    dt_acoustic = float(min_node_distance(dc.grid)) / 350.0

    from climatemachine_tpu.ode.lsrk import (LSRK54CarpenterKennedy,
                                             LSRK144NiegemannDiehlBusch)
    from climatemachine_tpu.ode.mis import MIS2

    # small-dt control
    ctrl = cm.ExplicitSolverType().make(dg, q0, aux0, 0.1 * dt_acoustic)
    st = solve(q0, aux0, ctrl, args.timeend)
    q_ctrl = st.q
    scale = float(jnp.max(jnp.abs(q_ctrl - q0))) + 1e-300

    menu = [
        ("LSRK54 (CFL 0.4)", cm.ExplicitSolverType(), 0.4, 5),
        ("LSRK144 (CFL 0.8)",
         cm.ExplicitSolverType(solver_method=LSRK144NiegemannDiehlBusch),
         0.8, 14),
        ("SSPRK33 (CFL 0.25)",
         cm.ExplicitSolverType(
             solver_method=cm.SSPRK33ShuOsher), 0.25, 3),
        # vertical acoustics implicit; dt bounded by the HORIZONTAL
        # acoustic CFL (dx = 5 dz -> 2.0 x the every-direction limit)
        ("IMEX ARK2+columnwise (4x)", cm.IMEXSolverType(), 2.0, 8),
        ("Multirate RK (slow/fast 8x)",
         cm.MultirateSolverType(timestep_ratio=8), 2.4, None),
        ("MIS2 (8 substeps)",
         cm.MISSolverType(mis_method=MIS2, nsubsteps=8), 2.4, None),
    ]
    print(f"{'solver':30s} {'dt/dt_ac':>8s} {'steps':>6s} "
          f"{'max|q-ctrl|/range':>18s}")
    for name, styp, cfl, _ in menu:
        dt = cfl * dt_acoustic
        sol = styp.make(dg, q0, aux0, dt)
        st = solve(q0, aux0, sol, args.timeend)
        err = float(jnp.max(jnp.abs(st.q - q_ctrl))) / scale
        nst = int(np.ceil(args.timeend / dt))
        print(f"{name:30s} {cfl:8.2f} {nst:6d} {err:18.3e}")
        assert bool(jnp.all(jnp.isfinite(st.q))), name
        assert err < 0.5, (name, err)


if __name__ == "__main__":
    main()
