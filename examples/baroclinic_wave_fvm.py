"""Baroclinic wave on the DG-horizontal / FV-vertical hybrid path
(reference experiments/TestCase/baroclinic_wave_fvm.jl): the DCMIP2016
balanced base state + perturbation integrated with DGFVModel — spectral
elements in the horizontal, polyorder-0 finite volumes with
minmod-limited linear reconstruction IN PRIMITIVE VARIABLES in the
vertical (reference HBFVReconstruction(FVLinear), poly_order=(5,0),
n_vert=20, Roe flux, no hyperdiffusion)::

    python examples/baroclinic_wave_fvm.py --timeend 300 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.fv import DGFVModel, FVLinear, HBFVReconstruction
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.dg.spatial import init_ode_state
from climatemachine_tpu.experiments.baroclinic_wave import \
    baroclinic_wave_init
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_cubed_sphere_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-horz", type=int, default=8)
    p.add_argument("--n-vert", type=int, default=20,
                   help="FV cells per column (reference n_vert=20)")
    p.add_argument("--poly", type=int, default=5,
                   help="horizontal DG order (vertical is FV, order 0)")
    p.add_argument("--timeend", type=float, default=3600.0)
    p.add_argument("--moist", action="store_true",
                   help="reference --with-moisture")
    p.add_argument("--cfl", type=float, default=0.2)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    domain_height = 30e3
    vert_range = ps.planet_radius + np.linspace(0.0, domain_height,
                                                args.n_vert + 1)
    topo = stacked_cubed_sphere_topology(args.n_horz, vert_range)
    grid = make_grid(topo, (args.poly, args.poly, 0), dtype=np.float64)

    # reference config_baroclinic_wave (fvm variant): no hyperdiffusion,
    # zero-viscosity closure, Roe flux
    physics = cm.AtmosPhysics(
        param_set=ps,
        orientation=cm.SphericalOrientation(),
        ref_state=cm.HydrostaticState(
            cm.DecayingTemperatureProfile(290.0, 220.0, 8e3)),
        turbulence=cm.ConstantKinematicViscosity(0.0),
        moisture=cm.EquilMoist() if args.moist else cm.DryModel())
    problem = cm.AtmosProblem(init_state=baroclinic_wave_init,
                              boundary_conditions=(cm.AtmosBC(),
                                                   cm.AtmosBC()))
    model = cm.AtmosModel(physics, problem,
                          sources=(cm.Gravity(), cm.Coriolis()))

    # reference fv_reconstruction = HBFVReconstruction(model, FVLinear()):
    # reconstruct pressure DEVIATIONS from the local hydrostatic profile
    dg = DGFVModel(model, grid,
                   reconstruction=HBFVReconstruction(model, FVLinear()),
                   numerical_flux_first_order=cm.RoeNumericalFlux())
    q, aux = init_ode_state(dg)

    # dt from the every-direction acoustic limit (reference
    # CFL_direction = EveryDirection(): the vertical FV cells set the
    # explicit limit at this aspect ratio)
    dx = min_node_distance(grid)
    dt = args.cfl * float(dx) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)

    mass0 = float(weightedsum(grid, q, 0))
    t, nsteps = 0.0, max(int(args.timeend / dt), 1)
    print(f"dt = {dt:.3f} s, elements = {grid.nelem}, "
          f"vertical cells = {args.n_vert}")
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
        if i % max(nsteps // 5, 1) == 0:
            u = model.prog(q, "rhou") / model.prog(q, "rho")[..., None]
            print(f"t = {t:8.1f} s  max|u| = "
                  f"{float(jnp.max(jnp.abs(u))):.2f} m/s")
    mass1 = float(weightedsum(grid, q, 0))
    finite = bool(jnp.all(jnp.isfinite(q)))
    print(f"mass drift = {abs(mass1 - mass0) / mass0:.3e}")
    print(f"finite: {finite}")
    assert finite


if __name__ == "__main__":
    main()
