"""Richards-equation soil-water tutorial: hydrostatic equilibrium and
wetting-front infiltration (reference tutorials/Land/Soil/Water/
equilibrium_test.jl + hydraulic_functions.jl).

Two phases, matching the reference tutorial's narrative:

1. **Equilibrium**: initialize the column at uniform hydraulic head
   h = psi + z = const; the Richards flux K(theta) grad(h) is exactly
   zero, so the column must not drift (a discrete steady state).
2. **Infiltration**: hold the surface near saturation (Dirichlet
   vartheta) over a drier column; a wetting front propagates downward
   while vartheta stays inside [theta_r, porosity].

Run::

    python examples/richards_soil_water.py --hours 4
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.spatial import DGModel, init_ode_state
from climatemachine_tpu.land.model import Dirichlet, LandBC


def column_config(model, nz=5, poly=3, zmax=1.0, dtype=np.float64):
    dc = cm.MultiColumnLandModelConfiguration(
        "richards", poly, (0.5, 0.5, zmax / nz), 1.0, 1.0, zmax, model,
        boundary=((1, 1), (1, 1), (1, 2)), dtype=dtype)
    dg = DGModel(model, dc.grid,
                 numerical_flux_first_order=dc.numerical_flux_first_order)
    return dc, dg


def run_equilibrium(params, hyd, steps=100, dt=20.0):
    """Phase 1: h = const column is a steady state (reference
    equilibrium_test.jl)."""
    def init_v(coords, t):
        psi = -coords[..., 2] - 0.5           # h = psi + z = -0.5
        S = hyd.inverse_matric_potential(psi)
        return params.theta_r + S * (params.porosity - params.theta_r)

    soil = cm.SoilModel(params=params,
                        water=cm.SoilWaterModel(hydraulics=hyd,
                                                initial_vartheta=init_v))
    model = cm.LandModel(soil)
    _, dg = column_config(model)
    q, aux = init_ode_state(dg)
    v0 = model.prog(q, "vartheta_l")

    solver = cm.LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    t = 0.0
    for _ in range(steps):
        q, aux = step(q, aux, t)
        t += dt
    drift = float(jnp.max(jnp.abs(model.prog(q, "vartheta_l") - v0)))
    print(f"equilibrium: {steps} steps of dt={dt}s, "
          f"max |vartheta drift| = {drift:.3e}")
    assert drift < 1e-8, "hydrostatic equilibrium drifted"


def run_infiltration(params, hyd, hours, dt=1.0):
    """Phase 2: near-saturated surface wets an initially dry column."""
    v_dry, v_top = 0.2, 0.38
    soil = cm.SoilModel(params=params,
                        water=cm.SoilWaterModel(
                            hydraulics=hyd,
                            initial_vartheta=lambda c, t:
                            jnp.full_like(c[..., 2], v_dry)))
    bcs = (LandBC(water=None),             # bottom: free drainage
           LandBC(water=Dirichlet(v_top)))  # top: near saturation
    model = cm.LandModel(soil, boundary_conditions=bcs)
    dc, dg = column_config(model, zmax=0.5, nz=4)
    q, aux = init_ode_state(dg)

    solver = cm.LSRK54CarpenterKennedy(lambda a, b, t: dg(a, b, t), dt)
    step = jax.jit(solver.step)
    t, nsteps = 0.0, max(1, int(hours * 3600 / dt))
    report = max(1, nsteps // 8)
    for i in range(nsteps):
        q, aux = step(q, aux, t)
        t += dt
        if (i + 1) % report == 0 or i + 1 == nsteps:
            v = model.prog(q, "vartheta_l")
            vmin, vmax = float(jnp.min(v)), float(jnp.max(v))
            # wetting-front depth: deepest point that moistened noticeably
            z = dg.grid.coords[..., 2].ravel()
            wet = np.asarray(v).ravel() > v_dry + 0.02
            front = float(np.min(z[wet])) if wet.any() else float("nan")
            print(f"t={t:8.0f}s  vartheta in [{vmin:.4f}, {vmax:.4f}]  "
                  f"front z >= {front:.3f} m")
            assert vmin > params.theta_r - 1e-8, "vartheta below residual"
            assert vmax < params.porosity + 1e-8, "vartheta above porosity"
    moistened = float(jnp.max(model.prog(q, "vartheta_l"))) > v_dry + 0.02
    print("infiltration: bounds held"
          + (", wetting front advanced" if moistened else
             " (run longer than ~0.5h for a visible front)"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=4.0)
    p.add_argument("--equilibrium-steps", type=int, default=100)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    params = cm.SoilParams()
    hyd = cm.vanGenuchten()
    run_equilibrium(params, hyd, steps=args.equilibrium_steps)
    run_infiltration(params, hyd, hours=args.hours)


if __name__ == "__main__":
    main()
