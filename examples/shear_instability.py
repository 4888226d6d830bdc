"""Kelvin-Helmholtz shear instability with the ocean SuperModel
(reference tutorials/Ocean/shear_instability.jl): an unstable shear
layer coinciding with a temperature front rolls up into billows that
stir the front::

    python examples/shear_instability.py --hours 2
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
    p.add_argument("--hours", type=float, default=2.0)
    p.add_argument("--ne", type=int, default=12)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    L, H = 1e5, 100.0
    U0, Lj = 0.5, 1e4          # jet speed / shear-layer width

    def tanhy(y):
        return jnp.tanh((y - L / 2) / Lj)

    rng_k = 2 * jnp.pi / (L / 4)   # seeded unstable wavelength

    model = cm.HydrostaticBoussinesqSuperModel(
        cm.RectangularDomain(Ne=(args.ne, args.ne, 1), Np=4,
                             x=(0, L), y=(0, L), z=(-H, 0.0),
                             periodicity=(True, False, False)),
        time_step=20.0,
        initial_conditions=cm.InitialConditions(
            u=lambda x, y, z: U0 * tanhy(y)
            + 0.02 * U0 * jnp.sin(rng_k * x) * jnp.cosh(
                (y - L / 2) / Lj) ** -2,
            theta=lambda x, y, z: 5.0 * tanhy(y)),
        turbulence_closure=dict(nu_h=5.0, nu_z=1e-3, kappa_h=5.0,
                                kappa_z=1e-4),
        rusanov_wave_speeds=dict(c_h=float(np.sqrt(9.81 * H)), c_z=1e-3))

    nhours = max(int(round(args.hours)), 1)
    for hour in range(nhours):
        model.solve(until=(hour + 1) * 3600.0)
        u = np.asarray(model.fields["u"])
        th = np.asarray(model.fields["theta"])
        print(f"t = {model.time/3600.0:4.1f} h  max|u| = "
              f"{np.abs(u).max():.3f} m/s  theta range = "
              f"[{th.min():.2f}, {th.max():.2f}]")
    assert np.isfinite(u).all()


if __name__ == "__main__":
    main()
