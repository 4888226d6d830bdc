"""Taylor-Green vortex (reference experiments/AtmosLES/taylor_green.jl):
triply-symmetric decaying vortex in a periodic-lateral box; kinetic
energy decays by viscous dissipation and vortex stretching.  Smoke::

    python examples/taylor_green.py --timeend 20 --platform cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm
from climatemachine_tpu.dg.reductions import weightedsum


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resolution", type=float, default=100.0)
    p.add_argument("--timeend", type=float, default=20.0)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    ps = cm.EARTH
    L = 1600.0
    V0 = 10.0

    physics = cm.AtmosPhysics(
        orientation=cm.NoOrientation(),
        ref_state=cm.HydrostaticState(cm.IsothermalProfile(300.0)),
        turbulence=cm.ConstantKinematicViscosity(5.0))

    def init(m, coords, aux, t):
        x = 2 * jnp.pi * coords[..., 0] / L
        y = 2 * jnp.pi * coords[..., 1] / L
        z = 2 * jnp.pi * coords[..., 2] / L
        u = V0 * jnp.sin(x) * jnp.cos(y) * jnp.cos(z)
        v = -V0 * jnp.cos(x) * jnp.sin(y) * jnp.cos(z)
        w = jnp.zeros_like(u)
        T0, p0 = 300.0, ps.MSLP
        # pressure perturbation of the incompressible TG solution
        rho0 = p0 / (ps.R_d * T0)
        dp = (rho0 / 16.0) * V0 ** 2 * (jnp.cos(2 * x) + jnp.cos(2 * y)) \
            * (jnp.cos(2 * z) + 2.0)
        rho = (p0 + dp) / (ps.R_d * T0)
        ke = 0.5 * (u ** 2 + v ** 2 + w ** 2)
        rhoe = rho * (cm.td.internal_energy(
            ps, T0 * jnp.ones_like(rho)) + ke)
        q = m.prog_spec.pack({"rho": rho, "rhoe": rhoe},
                             batch_shape=rho.shape)
        uvw = jnp.stack([u, v, w], axis=-1)
        return m.prog_spec.set(q, "rhou", rho[..., None] * uvw)

    model = cm.AtmosModel(
        physics,
        cm.AtmosProblem(init_state=init,
                        boundary_conditions=(cm.AtmosBC(), cm.AtmosBC())),
        sources=())
    dc = cm.AtmosLESConfiguration(
        "taylor_green", 4, (args.resolution,) * 3, L, L, L, model,
        dtype=np.float64)
    grid = dc.grid
    sc = cm.make_solver_configuration(0.0, args.timeend, dc,
                                      Courant_number=0.4)
    print(f"dt = {sc.dt:.3f} s, elements = {grid.nelem}")

    def ke_total(q):
        rho = q[..., 0]
        return float(weightedsum(
            grid, (0.5 * jnp.sum(q[..., 1:4] ** 2, axis=-1)
                   / rho)[..., None], 0))

    ke0 = ke_total(sc.q)
    cm.invoke(sc)
    ke1 = ke_total(sc.q)
    print(f"finite: {bool(jnp.all(jnp.isfinite(sc.q)))}   "
          f"KE: {ke0:.3e} -> {ke1:.3e} (viscous decay)")


if __name__ == "__main__":
    main()
