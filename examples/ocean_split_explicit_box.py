"""Split-explicit wind-driven ocean gyre (reference
experiments/OceanSplitExplicit/simple_box.jl): the OceanGyre problem
(zonal wind stress + surface temperature relaxation, reference
config_simple_box :204-210) integrated with the barotropic/baroclinic
split-explicit solver — a fast 2-D shallow-water model substeps each
slow LSRK stage — plus the IVDC implicit vertical diffusion /
convective-adjustment solve (reference OceanModel numImplSteps=5,
ivdc_dt=dt_slow/5) applied between slow steps::

    python examples/ocean_split_explicit_box.py --hours 6 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.numerical_fluxes import (
    CentralNumericalFluxFirstOrder)
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import brick_topology
from climatemachine_tpu.ocean.ivdc import ivdc_solve
from climatemachine_tpu.ocean.problems import OceanGyre, ocean_box_grid
from climatemachine_tpu.ocean.shallow_water import ConstantViscosity
from climatemachine_tpu.ocean.split_explicit import (BarotropicModel,
                                                     CoupledHBModel,
                                                     SplitExplicitSolver)
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=6.0)
    p.add_argument("--nx", type=int, default=4)
    p.add_argument("--nz", type=int, default=4)
    p.add_argument("--dt-slow", type=float, default=90.0 * 60.0)
    p.add_argument("--dt-fast", type=float, default=240.0)
    p.add_argument("--num-impl-steps", type=int, default=5)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    Lx = Ly = 4e6
    H = 1000.0
    # reference config_simple_box: OceanGyre(tau_o=0.1, lam_r=10/86400,
    # theta_E=10), OceanModel(c_h=1, kappa_c=0.1)
    problem = OceanGyre(Lx, Ly, H, tau_o=0.1, lam_r=10.0 / 86400.0,
                        theta_E=10.0)
    m3 = CoupledHBModel(problem, c_h=1.0, kappa_c=0.1)
    m2 = BarotropicModel(problem, turbulence=ConstantViscosity(m3.nu_h),
                         advection=None, c=1.0)

    grid3 = ocean_box_grid(problem, args.nx, args.nx, args.nz, 4,
                           dtype=np.float64)
    ranges = [np.linspace(0.0, Lx, args.nx + 1),
              np.linspace(0.0, Ly, args.nx + 1)]
    topo2 = brick_topology(ranges, periodicity=(False, False),
                           boundary=np.array([[1, 1], [1, 1]]))
    grid2 = make_grid(topo2, 4, dtype=np.float64)

    dg3 = DGModel(m3, grid3)
    dg2 = DGModel(m2, grid2,
                  numerical_flux_first_order=CentralNumericalFluxFirstOrder())
    # barotropic mode starts at rest (reference Q_2D = init_ode_state(
    # dg_2D, 0) with the gyre's zero barotropic initial condition)
    def sw_rest(model, coords, aux, t):
        return jnp.zeros(coords.shape[:-1] + (model.prog_spec.num,),
                         dtype=coords.dtype)

    problem.init_state = sw_rest
    q2, aux2 = init_ode_state(dg2)
    del problem.init_state            # restore class-level 3-D init
    q3, aux3 = init_ode_state(dg3)

    dt = args.dt_slow
    slow = LSRK54CarpenterKennedy(lambda a, b, t: dg3(a, b, t), dt)
    fast = LSRK54CarpenterKennedy(lambda a, b, t: dg2(a, b, t), args.dt_fast)
    se = SplitExplicitSolver(slow, fast, dg3, dg2, dt=dt,
                             fast_dt=args.dt_fast)
    step = jax.jit(se.step)
    ivdc_dt = dt / args.num_impl_steps

    def implicit(q3, aux3):
        for _ in range(args.num_impl_steps):
            q3 = ivdc_solve(m3, dg3, q3, aux3, ivdc_dt)
        return q3

    implicit = jax.jit(implicit)

    q, aux = (q3, q2), (aux3, aux2)
    t, nsteps = 0.0, max(int(args.hours * 3600 / dt), 1)
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        q = (implicit(q[0], aux[0]), q[1])
        t += dt
        q3c, q2c = q
        u = m3.prog(q3c, "u")
        U = m2.prog(q2c, "U")
        print(f"t = {t/3600.0:7.2f} h   max|u| = "
              f"{float(jnp.max(jnp.abs(u))):.5f} m/s   max|U| = "
              f"{float(jnp.max(jnp.abs(U))):.4f} m^2/s")
    q3, q2 = q
    assert bool(jnp.all(jnp.isfinite(q3))) and bool(jnp.all(jnp.isfinite(q2)))
    eta = m3.prog(q3, "eta")
    th = m3.prog(q3, "theta")
    print(f"final: max|eta| = {float(jnp.max(jnp.abs(eta))):.5f} m   "
          f"theta in [{float(jnp.min(th)):.3f}, {float(jnp.max(th)):.3f}] C")


if __name__ == "__main__":
    main()
