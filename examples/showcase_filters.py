"""Filter showcase (reference
tutorials/Numerics/DGMethods/showcase_filters.jl).

Applies every spectral filter the framework ships to the same
under-resolved 2-D field (a step in x times a sine in y, rich in
high-order modes) and prints what each does: retained L2 energy,
overshoot, and mass change — cutoff and mass-preserving-cutoff differ
exactly by the mean mode, TMAR clips negatives while conserving mass,
exponential/Boyd damp smoothly with order s.  Smoke::

    python examples/showcase_filters.py
"""

import argparse
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.mesh import filters as flt
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import brick_topology


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=8)
    p.add_argument("--poly", type=int, default=6)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    ranges = [np.linspace(0.0, 1.0, args.nel + 1)] * 2
    topo = brick_topology(ranges, periodicity=(True, True))
    grid = make_grid(topo, args.poly, dtype=np.float64)
    x = grid.coords[..., 0]
    y = grid.coords[..., 1]
    q = (jnp.where((x > 0.3) & (x < 0.7), 1.0, 0.0)
         * (1.0 + 0.5 * jnp.sin(6 * np.pi * y)))[..., None]

    M = grid.M[..., None]
    mass0 = float(jnp.sum(M * q))
    l2_0 = float(jnp.sum(M * q * q))

    cases = [
        ("CutoffFilter(Nc=3)", lambda a: flt.CutoffFilter(grid, Nc=3)(a)),
        ("MassPreservingCutoff(Nc=3)",
         lambda a: flt.MassPreservingCutoffFilter(grid, Nc=3)(a)),
        ("ExponentialFilter(s=8)",
         lambda a: flt.ExponentialFilter(grid, Nc=1, s=8)(a)),
        ("BoydVandevenFilter(s=8)",
         lambda a: flt.BoydVandevenFilter(grid, Nc=1, s=8)(a)),
        ("TMAR", lambda a: flt.tmar(grid, a)),
    ]
    print(f"{'filter':30s} {'L2 kept':>8s} {'min':>8s} {'max':>8s} "
          f"{'dMass/Mass':>11s}")
    for name, f in cases:
        qf = f(q)
        l2 = float(jnp.sum(M * qf * qf)) / l2_0
        dm = (float(jnp.sum(M * qf)) - mass0) / abs(mass0)
        print(f"{name:30s} {l2:8.4f} {float(qf.min()):+8.4f} "
              f"{float(qf.max()):+8.4f} {dm:+11.2e}")
        assert bool(jnp.all(jnp.isfinite(qf)))
        if "MassPreserving" in name or name == "TMAR":
            assert abs(dm) < 1e-12, name
        if name == "TMAR":
            assert float(qf.min()) >= -1e-14


if __name__ == "__main__":
    main()
