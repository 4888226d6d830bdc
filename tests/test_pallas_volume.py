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
