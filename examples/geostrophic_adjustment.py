"""Geostrophic adjustment with the ocean SuperModel (reference
tutorials/Ocean/geostrophic_adjustment.jl): a half-balanced Gaussian
surface bump radiates gravity waves and adjusts toward balance::

    python examples/geostrophic_adjustment.py --hours 4
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
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", True)

    Lx = 1e6
    f, g = 1e-4, 9.81
    U, Lg = 0.1, Lx / 40
    a = f * U * Lg / g
    x0 = Lx / 4
    gauss = lambda x: jnp.exp(-x ** 2 / (2 * Lg ** 2))

    model = cm.HydrostaticBoussinesqSuperModel(
        cm.RectangularDomain(Ne=(25, 1, 1), Np=4, x=(0, Lx), y=(0, Lx),
                             z=(-400.0, 0.0),
                             periodicity=(False, True, False)),
        time_step=30.0,
        initial_conditions=cm.InitialConditions(
            v=lambda x, y, z: -U * (x - x0) / Lg * gauss(x - x0),
            eta=lambda x, y, z: 2 * a * gauss(x - x0)),
        coriolis=dict(f_0=f, beta=0.0),
        turbulence_closure=dict(nu_h=1e3, nu_z=1e-2, kappa_h=1e3,
                                kappa_z=1e-4),
        rusanov_wave_speeds=dict(c_h=float(np.sqrt(g * 400.0)), c_z=1e-3))

    for hour in range(int(args.hours)):
        model.solve(until=(hour + 1) * 3600.0)
        eta = np.asarray(model.fields["eta"])
        print(f"t = {model.time/3600.0:5.1f} h  max eta = {eta.max():.5f} m"
              f"  (initial bump {2*a:.5f} m)")


if __name__ == "__main__":
    main()
