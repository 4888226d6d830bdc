"""Pallas fused volume kernel vs the XLA reference path (interpret mode
on CPU; runs native on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from climatemachine_tpu.dg import pallas_volume as pv
from climatemachine_tpu.dg.spatial import (DGModel, init_ode_state,
                                           contract_flux_metric,
                                           weak_divergence_sel,
                                           direction_dims)
from climatemachine_tpu.experiments.held_suarez import held_suarez_config


def test_pallas_volume_matches_xla():
    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float32)
    dg = DGModel(cfg.model, cfg.grid)
    q, aux = init_ode_state(dg)
    bl, g = cfg.model, cfg.grid
    assert pv.supports(bl, g, "every")

    dims = direction_dims("every", 3)
    F = bl.flux_first_order(q, aux, 0.0)
    F_xi = contract_flux_metric(g, F, dims)
    ref = g.MI[..., None] * weak_divergence_sel(g, F_xi, dims)

    out = pv.volume_tendency_from_grid(dg, q, aux, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-5 * scale, (err, scale)


def test_pallas_full_rhs_matches_xla():
    """Full DG RHS (incl. hyperdiffusion second-order volume add-on) with
    the forced pallas volume path == pure XLA path."""
    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float32)
    dg_x = DGModel(cfg.model, cfg.grid, volume_kernel="xla")
    dg_p = DGModel(cfg.model, cfg.grid, volume_kernel="pallas")
    assert dg_p._pallas_volume
    q, aux = init_ode_state(dg_x)
    tx, _ = jax.jit(lambda q, a: dg_x(q, a, 0.0))(q, aux)
    tp, _ = jax.jit(lambda q, a: dg_p(q, a, 0.0))(q, aux)
    scale = float(jnp.max(jnp.abs(tx)))
    assert float(jnp.max(jnp.abs(tp - tx))) < 1e-5 * scale


def test_pallas_volume_remainder_matches_generic():
    """Pallas volume kernel with in-VMEM linear-flux subtraction (IMEX
    remainder) equals the generic remainder volume path (reference
    remainder.jl:37; interpret mode on CPU)."""
    import numpy as np
    from climatemachine_tpu.atmos.linear import \
        AtmosAcousticGravityLinearModel
    from climatemachine_tpu.dg.spatial import DGModel, VERTICAL, \
        init_ode_state
    from climatemachine_tpu.experiments.held_suarez import \
        held_suarez_config

    cfg = held_suarez_config(n_horz=2, n_vert=2, poly_order=3,
                             dtype=np.float64)
    lin = AtmosAcousticGravityLinearModel(cfg.model)
    rem = (lin, VERTICAL)
    dg0 = DGModel(cfg.model, cfg.grid, remainder=rem, volume_kernel="xla",
                  surface_kernel="xla")
    dg1 = DGModel(cfg.model, cfg.grid, remainder=rem,
                  volume_kernel="pallas", surface_kernel="xla")
    assert dg1._pallas_volume
    q, aux = init_ode_state(dg0)
    rng = np.random.default_rng(11)
    q = q * (1 + 1e-3 * jnp.asarray(rng.standard_normal(q.shape)))
    t0, _ = dg0(q, aux, 0.0)
    t1, _ = dg1(q, aux, 0.0)
    scale = float(jnp.max(jnp.abs(t0)))
    # kernel dots run at f32 (matching the benchmark dtype); the
    # remainder's vertical cancellation puts parity at ~1e-5 relative
    assert float(jnp.max(jnp.abs(t1 - t0))) < 3e-5 * scale
