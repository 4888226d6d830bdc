"""Single-stack EDMF boundary layer (reference
test/Atmos/EDMF/stable_bl_edmf.jl / bomex_edmf.jl): one updraft +
environment TKE over a stable surface layer::

    python examples/bomex_edmf.py --timeend 30
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.atmos.edmf import NeutralDrySurfaceModel
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.mesh.filters import tmar
from climatemachine_tpu.mesh.grid import make_grid, min_node_distance
from climatemachine_tpu.mesh.topology import single_stack_topology


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timeend", type=float, default=30.0)
    p.add_argument("--zmax", type=float, default=400.0)
    p.add_argument("--nelem-vert", type=int, default=15)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    topo = single_stack_topology(
        20.0, 20.0, np.linspace(0, args.zmax, args.nelem_vert + 1))
    grid = make_grid(topo, 4, dtype=np.float64)
    edmf = cm.EDMF(N_up=1, surface=NeutralDrySurfaceModel())
    physics = cm.AtmosPhysics(
        ref_state=cm.HydrostaticState(cm.DryAdiabaticProfile(265.0, 110.0)),
        turbulence=cm.ConstantKinematicViscosity(0.0),
        turbconv=edmf)

    def init(m, coords, aux, t):
        z = coords[..., 2]
        pr = m.aux_spec.get(aux, "ref_state.p")
        Phi = m.aux_spec.get(aux, "orientation.Phi")
        theta = 265.0 + 0.01 * jnp.maximum(z - 100.0, 0.0)
        T = theta * (pr / ps.MSLP) ** ps.kappa_d
        rho = pr / (ps.R_d * T)
        u = jnp.full_like(rho, 8.0)
        q = m.prog_spec.pack(
            {"rho": rho,
             "rhoe": rho * (cm.td.internal_energy(ps, T) + Phi
                            + 0.5 * 64.0)},
            batch_shape=rho.shape)
        return m.prog_spec.set(
            q, "rhou", jnp.stack([rho * u, 0 * u, 0 * u], axis=-1))

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=(cm.Gravity(),))
    dg = DGModel(model, grid)
    q, aux = init_ode_state(dg)

    dt = 0.4 * float(min_node_distance(grid)) / 340.0
    solver = cm.LSRK144NiegemannDiehlBusch(lambda a, b, t: dg(a, b, t), dt)
    names = model.prog_spec.flattened_names()
    tc_slots = [i for i, n in enumerate(names)
                if n.startswith("turbconv.") and "rhoaw" not in n]

    def stepf(q, aux, t):
        q, aux = solver.step(q, aux, t)
        return tmar(grid, q, fields=tc_slots), aux

    step = jax.jit(stepf)
    t, nsteps = 0.0, int(args.timeend / dt)
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
    z = np.asarray(grid.coords[..., 2])
    tke = np.asarray(model.prog_spec.get(q, "turbconv.en_rhoatke"))
    rhoa = np.asarray(model.prog_spec.get(q, "turbconv.up_rhoa"))[..., 0]
    print(f"t = {t:.1f} s ({nsteps} steps)")
    print(f"surface TKE (z<40m):  {tke[z < 40].mean():.4f} kg/m/s^2")
    print(f"updraft area (z<40m): {rhoa[z < 40].mean():.5f}")


if __name__ == "__main__":
    main()
