"""Stack (column) integral operators vs analytic antiderivatives
(reference test/Numerics/DGMethods/integral_test.jl)."""

import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg.columns import ColumnOps
from climatemachine_tpu.mesh.grid import make_grid
from climatemachine_tpu.mesh.topology import stacked_brick_topology

H = 1000.0


def _grid(zpts):
    r = [np.linspace(0, 1e3, 3), np.linspace(0, 1e3, 3), np.asarray(zpts)]
    topo = stacked_brick_topology(r, periodicity=(True, True, False),
                                  boundary=np.array([[0, 0], [0, 0],
                                                     [1, 2]]))
    return make_grid(topo, 4, dtype=np.float64)


def test_stack_integrals_polynomial_exact():
    # non-uniform vertical spacing exercises JcV; integrand degree ≤ p
    # so the nodal interpolant is exact and the integral is exact
    g = _grid(np.array([0.0, 180.0, 420.0, 700.0, 1000.0]))
    ops = ColumnOps(g)
    z = g.coords[..., 2:3]
    f3 = (z / H) ** 3
    got = ops.indefinite_integral(f3)
    want = z ** 4 / (4 * H ** 3)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-10

    gotr = ops.reverse_indefinite_integral(f3)
    wantr = H / 4 - want
    assert float(jnp.max(jnp.abs(gotr - wantr))) < 1e-10

    tot = ops.column_total(f3)
    assert float(jnp.max(jnp.abs(tot - H / 4))) < 1e-10

    top = ops.broadcast_top(got)
    assert float(jnp.max(jnp.abs(top - H / 4))) < 1e-10
    bot = ops.broadcast_bottom(got)
    assert float(jnp.max(jnp.abs(bot))) < 1e-10


def test_stack_integral_spectral_convergence():
    # smooth non-polynomial integrand: error drops at ~order p+1
    errs = []
    for nv in (2, 4):
        g = _grid(np.linspace(0.0, H, nv + 1))
        ops = ColumnOps(g)
        z = g.coords[..., 2:3]
        got = ops.indefinite_integral(jnp.cos(jnp.pi * z / H))
        want = H / jnp.pi * jnp.sin(jnp.pi * z / H)
        errs.append(float(jnp.max(jnp.abs(got - want))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 4.5, (errs, rate)
