"""Rising thermal bubble on the DG-horizontal / FV-vertical hybrid path
(reference experiments/TestCase/risingbubble_fvm.jl): N = (4, 0), Roe
flux, HBFVReconstruction(FVLinear) — the vertical column is a
finite-volume stack reconstructing pressure deviations from the local
hydrostatic profile, while the horizontal stays spectral DG.

Reference config (risingbubble_fvm.jl:200-213): 10 km x 0.5 km x 10 km
box at 125 m effective resolution, 2 K bubble at (5000, 2000) m with
rc = 2 km, dry adiabatic reference state, LSRK54 at CFL 0.2.

Smoke::

    python examples/risingbubble_fvm.py --timeend 50 --platform cpu
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
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import stacked_brick_topology
from climatemachine_tpu.ode.lsrk import LSRK54CarpenterKennedy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--dh", type=float, default=125.0,
                   help="effective horizontal resolution (m)")
    p.add_argument("--dv", type=float, default=125.0,
                   help="vertical FV cell size (m)")
    p.add_argument("--timeend", type=float, default=1000.0)
    p.add_argument("--cfl", type=float, default=0.2)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    xmax, ymax, zmax = 10000.0, 500.0, 10000.0
    # effective resolution -> element count (reference AtmosLESConfiguration
    # semantics: element size = resolution * (N + 1) per direction)
    nx = max(int(xmax / (args.dh * (args.poly + 1))), 1)
    ny = max(int(ymax / (args.dh * (args.poly + 1))), 1)
    nz = max(int(zmax / args.dv), 1)
    topo = stacked_brick_topology(
        [np.linspace(0, xmax, nx + 1), np.linspace(0, ymax, ny + 1),
         np.linspace(0, zmax, nz + 1)],
        periodicity=(True, True, False),
        boundary=np.array([[0, 0], [0, 0], [1, 2]]))
    grid = make_grid(topo, (args.poly, args.poly, 0), dtype=np.float64)

    physics = cm.AtmosPhysics(
        param_set=ps,
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(300.0, 0.0)),
        turbulence=cm.ConstantKinematicViscosity(0.0))

    def init(m, coords, aux, t):
        x, z = coords[..., 0], coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        r = jnp.sqrt((x - 5000.0) ** 2 + (z - 2000.0) ** 2)
        dtheta = 2.0 * jnp.clip(1.0 - r / 2000.0, 0.0, 1.0)
        theta = 300.0 + dtheta
        T = theta * (pr / ps.MSLP) ** ps.kappa_d
        rho = pr / (ps.R_d * T)
        return m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (cm.td.internal_energy(ps, T) + Phi)},
            batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))

    dg = DGFVModel(model, grid,
                   reconstruction=HBFVReconstruction(model, FVLinear()),
                   numerical_flux_first_order=cm.RoeNumericalFlux())
    q, aux = init_ode_state(dg)

    dt = args.cfl * float(min_node_distance(grid)) / 350.0
    solver = LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)

    mass0 = float(weightedsum(grid, q, 0))
    t, nsteps = 0.0, max(int(args.timeend / dt), 1)
    print(f"dt = {dt:.3f} s, elements = {grid.nelem} "
          f"({nx}x{ny} horz x {nz} FV cells)")
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
        if i % max(nsteps // 5, 1) == 0:
            w = model.prog(q, "rhou")[..., 2] / model.prog(q, "rho")
            print(f"t = {t:7.1f} s  max w = {float(jnp.max(w)):.3f} m/s")
    mass1 = float(weightedsum(grid, q, 0))
    finite = bool(jnp.all(jnp.isfinite(q)))
    w = model.prog(q, "rhou")[..., 2] / model.prog(q, "rho")
    print(f"max updraft = {float(jnp.max(w)):.3f} m/s, "
          f"mass drift = {abs(mass1 - mass0) / mass0:.3e}, "
          f"finite = {finite}")
    assert finite


if __name__ == "__main__":
    main()
