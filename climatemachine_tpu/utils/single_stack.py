"""Single-stack (single-column) utilities.

Scope of reference ``src/Utilities/SingleStackUtils/``
(get_vars_from_nodal_stack, single_stack_diagnostics): extract/average
vertical columns of state for 1-D configurations and diagnostics.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def get_vars_from_nodal_stack(grid, q, spec, i: int = 0, j: int = 0,
                              eh: int = 0) -> Dict[str, np.ndarray]:
    """Extract a single vertical column's named profiles (reference
    get_vars_from_nodal_stack): {name: [n_vert*Nq3]}."""
    Nq1, Nq2, Nq3 = grid.Nq
    qs = np.asarray(q).reshape(grid.n_horz, grid.n_vert, Nq3, Nq2, Nq1, -1)
    col = qs[eh, :, :, j, i, :].reshape(grid.n_vert * Nq3, -1)
    return {name: col[:, k] for k, name in
            enumerate(spec.flattened_names())}


def get_horizontal_mean(grid, q, spec) -> Dict[str, np.ndarray]:
    """M-weighted horizontal mean profiles of all variables (reference
    get_horizontal_mean)."""
    from climatemachine_tpu.diagnostics.machine import horizontal_average
    out = {}
    for k, name in enumerate(spec.flattened_names()):
        out[name] = np.asarray(horizontal_average(grid, q[..., k]))
    return out


def get_horizontal_variance(grid, q, spec) -> Dict[str, np.ndarray]:
    """Horizontal variance profiles (reference get_horizontal_variance)."""
    from climatemachine_tpu.diagnostics.machine import horizontal_average
    out = {}
    for k, name in enumerate(spec.flattened_names()):
        f = q[..., k]
        mean = horizontal_average(grid, f)
        Nq3 = grid.Nq[2]
        mean_nodal = jnp.broadcast_to(
            mean.reshape(grid.n_vert, Nq3)[None, :, :, None],
            (grid.n_horz, grid.n_vert, Nq3, grid.Nq[1] * grid.Nq[0]))
        fdev = f.reshape(mean_nodal.shape) - mean_nodal
        out[name] = np.asarray(horizontal_average(
            grid, (fdev ** 2).reshape(f.shape)))
    return out
