"""Solid-body rotation over DCMIP mountain topography (reference
experiments/TestCase/solid_body_rotation_mountain.jl).

Same rest-state setup as solid_body_rotation.py, but the cubed sphere
is warped by the DCMIP cosine-bell mountain (h0 = 2 km at
lambda = 3pi/2, reference Topologies.jl:2033 DCMIPMountain +
cubed_sphere_topo_warp via set_topofun, mountain experiment :94-98).
An atmosphere initialized at the hydrostatic reference state over the
TERRAIN-FOLLOWING mesh must stay near rest: spurious velocities measure
free-stream preservation of the warped metrics (the classic
mountain-torque error mode).  Reference script adds
ConstantKinematicViscosity(0) and runs IMEX ARK2 + columnwise LU; same
here.  Smoke::

    python examples/solid_body_rotation_mountain.py --timeend 600 \
        --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.reductions import weightedsum
from climatemachine_tpu.mesh.topology import dcmip_mountain_warp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-horz", type=int, default=4)
    p.add_argument("--n-vert", type=int, default=3)
    p.add_argument("--poly", type=int, default=4)
    p.add_argument("--h0", type=float, default=2000.0)
    p.add_argument("--timeend", type=float, default=3600.0)
    p.add_argument("--explicit", action="store_true")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    dtype = np.float64 if args.platform == "cpu" else np.float32
    if dtype == np.float64:
        jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    domain_height = 30e3
    profile = cm.DecayingTemperatureProfile(290.0, 220.0, 8e3)
    physics = cm.AtmosPhysics(
        param_set=ps,
        orientation=cm.SphericalOrientation(),
        ref_state=cm.HydrostaticState(profile),
        turbulence=cm.ConstantKinematicViscosity(0.0))

    def init(m, coords, aux, t):
        s = m.aux_spec
        rho = s.get(aux, "ref_state.rho")
        rhoe = s.get(aux, "ref_state.rhoe")
        return m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                                batch_shape=rho.shape)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(), cm.Coriolis()))

    warp = dcmip_mountain_warp(ps.planet_radius,
                               ps.planet_radius + domain_height,
                               h0=args.h0)
    dc = cm.AtmosGCMConfiguration(
        "solid_body_rotation_mountain", args.poly,
        (args.n_horz, args.n_vert), domain_height, model, dtype=dtype,
        meshwarp=warp)
    dc.numerical_flux_first_order = cm.RoeNumericalFlux()

    solver_type = cm.ExplicitSolverType() if args.explicit \
        else cm.IMEXSolverType()
    sc = cm.make_solver_configuration(
        0.0, args.timeend, dc, ode_solver_type=solver_type,
        Courant_number=0.2, CFL_direction="horizontal")
    grid, q0 = dc.grid, sc.q
    r = jnp.linalg.norm(grid.coords, axis=-1)
    # surface nodes: bottom face of the bottom element layer
    nv = args.n_vert
    r_sfc = r.reshape(grid.nelem // nv, nv, -1)[:, 0, :].min(axis=1)
    print(f"dt = {sc.dt:.2f} s, elements = {grid.nelem}, "
          f"mountain crest: "
          f"{float(jnp.max(r_sfc)) - ps.planet_radius:.0f} m")

    m0 = float(weightedsum(grid, q0, 0))
    ratio = cm.invoke(sc)
    q = sc.q
    m1 = float(weightedsum(grid, q, 0))
    umax = float(jnp.max(jnp.linalg.norm(
        q[..., 1:4] / q[..., :1], axis=-1)))
    print(f"norm(Q)/norm(Q0) = {ratio:.8f}   "
          f"mass rel drift = {abs(m1 - m0) / abs(m0):.2e}   "
          f"max |u| (terrain-induced) = {umax:.3e} m/s")
    assert bool(jnp.all(jnp.isfinite(q)))


if __name__ == "__main__":
    main()
