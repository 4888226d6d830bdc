"""Internal gravity wave in a stratified box with the ocean SuperModel
(reference tutorials/Ocean/internal_wave.jl): a localized buoyancy
perturbation in uniform stratification radiates internal waves along
characteristic beams::

    python examples/internal_wave.py --hours 4
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu import driver_api as cm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=4.0)
    p.add_argument("--ne", type=int, default=10)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    L, H = 1e5, 200.0
    dTdz = 0.02                  # uniform stratification [K/m]
    x0, z0, Lb = L / 2, -H / 2, L / 20

    model = cm.HydrostaticBoussinesqSuperModel(
        cm.RectangularDomain(Ne=(args.ne, 1, max(args.ne // 2, 2)), Np=4,
                             x=(0, L), y=(0, L), z=(-H, 0.0),
                             periodicity=(True, True, False)),
        time_step=25.0,
        initial_conditions=cm.InitialConditions(
            theta=lambda x, y, z: dTdz * z
            + 0.5 * jnp.exp(-((x - x0) ** 2 / (2 * Lb ** 2))
                             - ((z - z0) ** 2 / (2 * (H / 10) ** 2)))),
        turbulence_closure=dict(nu_h=10.0, nu_z=1e-3, kappa_h=10.0,
                                kappa_z=1e-4),
        buoyancy=dict(alpha_T=2e-4),   # couple θ to the pressure field
        rusanov_wave_speeds=dict(c_h=float(np.sqrt(9.81 * H)), c_z=1e-3))

    nhours = max(int(round(args.hours)), 1)
    for hour in range(nhours):
        model.solve(until=(hour + 1) * 3600.0)
        u = np.asarray(model.fields["u"])
        th = np.asarray(model.fields["theta"])
        print(f"t = {model.time/3600.0:4.1f} h  max|u| = "
              f"{np.abs(u).max()*1e3:.3f} mm/s  theta range = "
              f"[{th.min():.3f}, {th.max():.3f}]")
    assert np.isfinite(u).all()


if __name__ == "__main__":
    main()
