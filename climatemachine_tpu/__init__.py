"""ClimateMachine-TPU: a TPU-native Earth-system simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ClimateMachine.jl (discontinuous-Galerkin spectral-element solver for PDE
balance laws: atmosphere LES & GCM, ocean, land), built TPU-first:

- state arrays laid out ``[elem, node, var]`` so DG derivative and lift
  operators are batched matmuls on the MXU,
- face coupling through precomputed gather maps (pure gathers, no scatters
  in the hot path),
- horizontal domain decomposition over a ``jax.sharding.Mesh`` with
  device-local vertical columns (the reference's column-on-rank invariant,
  cf. reference ``src/Numerics/Mesh/Topologies.jl:333-372``),
- trace-time physics composition (config -> closures) instead of runtime
  dispatch.

Reference layer map: ``SURVEY.md`` section 1; reference code mounted at
``/root/reference`` (studied for behavior, not translated).
"""

__version__ = "0.1.0"

from climatemachine_tpu.utils.ftypes import default_float, set_default_float
